from .core import (
    Module,
    Linear,
    MLP,
    LayerNorm,
    BatchNorm,
    InstanceNorm,
    PReLU,
    Identity,
    Embedding,
    MultiEmbedding,
    make_norm,
    activation,
    prelu_init,
    dropout,
    init_all,
)

__all__ = [
    "Module", "Linear", "MLP", "LayerNorm", "BatchNorm", "InstanceNorm", "PReLU",
    "Identity", "Embedding", "MultiEmbedding", "make_norm", "activation",
    "prelu_init", "dropout", "init_all",
]
