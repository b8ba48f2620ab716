from goofer_tpu.analysis.pitch import track_pitch, fix_f0_gaps
from goofer_tpu.analysis.formants import track_formants
from goofer_tpu.analysis.features import extract_features
