"""Fused dequant+matmul kernels (Pallas) for packed QTensors.

TPU counterpart of ggml-cuda's mmq/mmvq kernels
(/root/reference/ggml/src/ggml-cuda/mmq.cuh, mmvq.cu): weights stay packed in
HBM; dequantization happens on-chip per tile feeding the MXU.

`matmul_packed` returns None when no kernel covers (shape, kind); callers fall
back to the XLA dequant path in ops/linear.py.
"""
from __future__ import annotations

import jax.numpy as jnp

from .linear import QTensor


def matmul_packed(x: jnp.ndarray, qt: QTensor):
    """Dispatch to a Pallas kernel if one applies, else None."""
    return None
