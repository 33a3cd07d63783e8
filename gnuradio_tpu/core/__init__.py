from . import block, compile, graph, runtime, stream
from .block import (Block, SyncBlock, DecimBlock, InterpBlock, SourceBlock,
                    SinkBlock)
from .graph import Flowgraph
from .hier import HierBlock
from .compile import CompiledGraph
from .runtime import TopBlock
from .stream import PortSpec, port
