from . import analog, blocks, filter, firdes, fxpt, iir_core
