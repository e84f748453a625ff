"""PyTorch checkpoint -> JAX param-pytree conversion."""

from . import torch_import  # noqa: F401
