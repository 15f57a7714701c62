from . import synth_corpus  # noqa: F401
