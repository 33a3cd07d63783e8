from . import wfm
