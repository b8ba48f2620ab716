from goofer_tpu.models.hnm import extract_features, synthesize
