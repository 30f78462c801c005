"""``DenseField`` — N-d dense array (reference ``container/DenseField.hpp``:
a Vector + shape vector with ``operator()(i, j, ...)``) and ``DenseGrid``.

In JAX a dense field *is* an ``jnp.ndarray``; this thin wrapper only adds
the reference's API surface (named construction, cross-space placement,
flat/strided views) so ported call sites read the same.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["DenseField", "dense_field"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseField:
    data: jax.Array

    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    def __getitem__(self, idx):
        return self.data[idx]

    def __call__(self, *idx):
        return self.data[idx]

    @property
    def flat(self) -> jax.Array:
        return self.data.reshape(-1)

    def set(self, idx, value) -> "DenseField":
        return DenseField(self.data.at[idx].set(value))

    def fill(self, value) -> "DenseField":
        return DenseField(jnp.full_like(self.data, value))

    def reshape(self, *shape) -> "DenseField":
        return DenseField(self.data.reshape(*shape))

    def to_device(self, device_or_sharding) -> "DenseField":
        return DenseField(jax.device_put(self.data, device_or_sharding))


def dense_field(shape, dtype=jnp.float32, fill=0) -> DenseField:
    return DenseField(jnp.full(tuple(shape), fill, dtype))
