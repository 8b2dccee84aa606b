from . import loss, metrics, optim

__all__ = ["loss", "metrics", "optim"]
