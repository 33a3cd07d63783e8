from . import fir_xla
