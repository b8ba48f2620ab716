from goofer_tpu.sampler.flags import parse_flags, NoteParams, note_to_midi, midi_to_hz
from goofer_tpu.sampler.pitchstring import pitch_string_to_cents
