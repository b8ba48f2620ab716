from goofer_tpu.engine.synth import SynthStatic, default_knobs, synthesize
