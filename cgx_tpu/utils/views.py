"""Offset views: index a local (token-sharded) array slice with GLOBAL indices.

The scan/extraction kernels address ``refstr``/``rlp``/``lr_tar`` with global
corpus positions.  In sharded-index mode each device holds only its token slice
(plus bounded halos); an ``OffsetView`` translates global indices to local ones
at every gather so the kernel bodies stay byte-for-byte identical between the
replicated and sharded layouts.

Correctness note: JAX gathers clamp out-of-range indices to the valid range (the
same semantics the kernels rely on for their explicit ``jnp.clip``/``minimum``
guards), so the extra clamp the view applies is a no-op whenever the logical
read is within the slice's halo — which the halo sizing in
``cgx_tpu.parallel.sharded`` guarantees for every reachable read.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OffsetView:
    """A local array slice addressed by global indices.

    ``shape`` reports the GLOBAL length so kernel-side bound arithmetic
    (``arr.shape[0] - 1`` clip limits) matches the replicated layout exactly.
    """

    arr: object      # local slice (jnp array)
    off: object      # global index of local element 0 (traced scalar ok)
    glen: object     # global logical length (traced scalar ok)

    @property
    def shape(self):
        return (self.glen,)

    def __getitem__(self, idx):
        local = idx - self.off
        return self.arr[jnp.clip(local, 0, self.arr.shape[0] - 1)]


def make_views(refstr, rlp, lr_tar, offs):
    """(refstr, rlp, lr_tar) as OffsetViews from an ``offs`` 5-tuple
    (src_off, tgt_off, refstr_glen, rlp_glen, lrtar_glen).  The replicated
    path passes offsets 0 and the true global lengths, making every view an
    identity mapping."""
    src_off, tgt_off, ref_glen, rlp_glen, tgt_glen = offs
    return (OffsetView(refstr, src_off, ref_glen),
            OffsetView(rlp, src_off, rlp_glen),
            OffsetView(lr_tar, tgt_off, tgt_glen))
