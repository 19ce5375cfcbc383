"""Shared kernel helpers."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def kernel_no_x64(f):
    """Trace a Pallas kernel body with x64 disabled: under
    jax_enable_x64, scalar index arithmetic inside the kernel promotes
    to int64 and Mosaic fails with 'failed to legalize func.func'.
    Existing tracers keep their dtypes — only new promotions change."""

    @functools.wraps(f)
    def g(*args, **kwargs):
        with jax.enable_x64(False):
            return f(*args, **kwargs)

    return g


def tala32(a, idx, axis):
    """take_along_axis that never promotes indices to int64 — Mosaic has
    no 64-bit types, and under jax_enable_x64 the jnp wrapper would
    convert the index dtype and break kernel lowering."""
    with jax.enable_x64(False):
        return jnp.take_along_axis(a, idx.astype(jnp.int32), axis=axis)
