"""Chunked host->device uploads.

A SINGLE eager ``jnp.asarray``/device_put of a large host array
(>= ~160 MB) through the axon tunnel sporadically hangs for many
minutes (observed repeatedly at 163-198 MB plane uploads; the same
arrays transferred in ~6 s on a retry, and a separate-process probe
measured ~30 MB/s steady at 64-128 MB). Slicing the upload along
axis 0 into <= 64 MB pieces and concatenating on device sidesteps the
pathology — the concat is one device-side XLA op over resident
buffers.

Reference capability: host->device operand staging for the large
matrix fixtures (``/root/reference/sparse_matrix.h:458-623`` sized by
``cpu_spmv.cpp:750-923``'s drivers); the chunking itself is a
tunnel-environment workaround with no reference analogue.
"""

from __future__ import annotations

DEFAULT_CHUNK_BYTES = 64 * 1024 * 1024


def device_put_chunked(a, chunk_bytes: int = DEFAULT_CHUNK_BYTES):
    """Upload a host numpy array in <= ``chunk_bytes`` slices along
    axis 0, concatenated on device. Falls through to a plain asarray
    for small arrays (or anything not sliceable along axis 0)."""
    import jax.numpy as jnp

    nbytes = getattr(a, "nbytes", 0)
    if nbytes <= chunk_bytes or a.ndim == 0 or a.shape[0] <= 1:
        return jnp.asarray(a)
    rows_per = max(1, int(chunk_bytes // max(1, nbytes // a.shape[0])))
    parts = [
        jnp.asarray(a[i:i + rows_per])
        for i in range(0, a.shape[0], rows_per)
    ]
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)
