"""`from gnuradio_tpu import gr` — the user-facing runtime namespace,
mirroring `from gnuradio import gr` (gnuradio-runtime/python/gnuradio/gr/)."""
from .core.block import (Block, SyncBlock, DecimBlock, InterpBlock,
                         SourceBlock, SinkBlock)
from .core.graph import Flowgraph
from .core.hier import HierBlock
from .core.runtime import TopBlock
from .core.stream import PortSpec, port, B, S, I, F, C

top_block = TopBlock  # gr.top_block() alias
hier_block2 = HierBlock  # gr.hier_block2 alias
