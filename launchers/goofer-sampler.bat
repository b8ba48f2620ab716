@echo off
rem OpenUtau/UTAU resampler launcher (Windows): forwards argv to the CLI.
python -m goofer_tpu.cli %*
