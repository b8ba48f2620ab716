from goofer_tpu.utils.audio_io import read_wav, write_wav
