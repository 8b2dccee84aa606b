from .sparse import (
    MsgNorm,
    GENConv,
    MRConv,
    EdgeConv,
    GATConv,
    RSAGEConv,
    SemiGCNConv,
    GINConv,
    graph_conv,
    DynConv,
    PlainDynBlock,
    ResDynBlock,
    DenseDynBlock,
    ResGraphBlock,
    DenseGraphBlock,
)
from .dense import (
    EdgeConv2d,
    MRConv2d,
    graph_conv2d,
    DynConv2d,
    PlainDynBlock2d,
    ResDynBlock2d,
    DenseDynBlock2d,
)

__all__ = [
    "MsgNorm", "GENConv", "MRConv", "EdgeConv", "GATConv", "RSAGEConv",
    "SemiGCNConv", "GINConv", "graph_conv", "DynConv",
    "PlainDynBlock", "ResDynBlock", "DenseDynBlock", "ResGraphBlock", "DenseGraphBlock",
    "EdgeConv2d", "MRConv2d", "graph_conv2d", "DynConv2d",
    "PlainDynBlock2d", "ResDynBlock2d", "DenseDynBlock2d",
]
