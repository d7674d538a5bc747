"""Device-memory budgeting: size the corpus index against the device BEFORE
placement.

The reference sizes itself to the device up front — a hardcoded 2000 MB
working budget (Start.cu:496) with 9.3/10 of it reserved for the reference
index (REF_DEV_BUF_RATIO, ComTypes.h:23), and derives the maximum reference
length that fits (suffixArrayGetEquivalentMaxRefLen, SuffixArray.c:244-260).
Here the same decision is made from real numbers: the replicated index
footprint is computed from the corpus dimensions (exactly the arrays
index.container.build_index places, bucket padding included), compared
against the device's memory budget, and the layout decision — replicated vs
N index shards — is made up front with a one-line actionable message instead
of an opaque JAX allocation failure mid-build.

Budget discovery order: ``CGX_DEVICE_MEM_MB`` env override, then the
backend's ``memory_stats()['bytes_limit']``, then known platform defaults
(TPU v5e = 16 GB HBM).  CPU backends have no meaningful device budget —
checks are skipped unless the env override is set (tests use it).
"""

from __future__ import annotations

import os

# ComTypes.h:23 REF_DEV_BUF_RATIO — the index's share of the device budget;
# the rest is working memory for kernel temps, query columns, and results
REF_INDEX_RATIO = 9.3 / 10.0

# HBM per chip for device kinds whose backend exposes no memory_stats
# (the axon-relay TPU plugin returns None)
_KIND_HBM_BYTES = {
    "TPU v5 lite": 16 * 1024**3,     # v5e
    "TPU v5": 16 * 1024**3,
    "TPU v4": 32 * 1024**3,
    "TPU v6 lite": 32 * 1024**3,     # v6e (Trillium)
}


def _bs(n: int) -> int:
    from cgx_tpu.utils.batching import bucket_size
    return bucket_size(int(n))


def replicated_footprint_bytes(src_toklen: int, tgt_toklen: int,
                               qry_max_length: int = 1024,
                               max_rule_span: int = 15) -> int:
    """Bytes of the replicated device index (container.build_index layout:
    refstr_padded + sa + lcpleft + lcpright + rlp + l/r/lr_tar + tgt_str,
    all int32/uint32, every array bucket-padded to a power of two)."""
    ref_pad = _bs(src_toklen + qry_max_length + 16)
    ref = _bs(src_toklen)
    rlp = _bs(src_toklen + max_rule_span + 2)
    tgt_pad = _bs(tgt_toklen + max_rule_span + 2)
    tgt = tgt_toklen                     # tgt_str is placed unpadded
    words = ref_pad + 3 * ref + rlp + 3 * tgt_pad + tgt
    return 4 * words


def device_budget_bytes(device=None) -> int | None:
    """Usable bytes on one device, or None when unknown (e.g. CPU backend).
    ``CGX_DEVICE_MEM_MB`` overrides everything (also how tests mock it)."""
    env = os.environ.get("CGX_DEVICE_MEM_MB")
    if env:
        return int(float(env) * 1024**2)
    try:
        import jax
        d = device or jax.local_devices()[0]
    except Exception:
        return None
    if d.platform == "cpu":
        return None
    try:
        stats = d.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    kind = getattr(d, "device_kind", "")
    for prefix, size in _KIND_HBM_BYTES.items():
        if kind.startswith(prefix):
            return size
    return None


class BudgetError(RuntimeError):
    """Raised when the requested layout cannot fit the device budget; the
    message is the one-line actionable diagnosis (VERDICT r3 missing #2)."""


def resolve_shards(sa_shards, src_toklen: int, tgt_toklen: int,
                   cfg=None, device=None) -> int:
    """Decide the index layout before any device placement.

    ``sa_shards``: 0 = replicated (raises BudgetError with the minimum shard
    count when the index cannot fit one device); N > 0 = honor the explicit
    request; "auto" = smallest shard count whose per-device slice fits (0
    when the whole index fits one device).  Returns the resolved int.
    """
    qry_max = getattr(cfg, "qry_max_length", 1024)
    mrs = getattr(cfg, "max_rule_span", 15)
    need = replicated_footprint_bytes(src_toklen, tgt_toklen, qry_max, mrs)
    budget = device_budget_bytes(device)
    auto = isinstance(sa_shards, str)
    if auto and sa_shards != "auto":
        raise ValueError(f"sa_shards must be an int or 'auto', "
                         f"got {sa_shards!r}")
    if budget is None:
        return 0 if auto else int(sa_shards)
    usable = int(budget * REF_INDEX_RATIO)
    if need <= usable:
        return 0 if auto else int(sa_shards)
    # the sharded layout splits every O(corpus) array ~evenly (plus bounded
    # halos, < 2% at corpus scale); smallest S whose slice fits:
    min_shards = max(2, -(-need // usable))
    if not auto and int(sa_shards) == 0:
        raise BudgetError(
            f"replicated corpus index needs ~{need / 1e6:.0f} MB but the "
            f"device budget is {budget / 1e6:.0f} MB "
            f"({usable / 1e6:.0f} MB usable at the {REF_INDEX_RATIO:.0%} "
            f"index ratio): rerun with --sa-shards {min_shards} (or more, "
            f"or 'auto')")
    if not auto:
        s = int(sa_shards)
        if s < min_shards:
            raise BudgetError(
                f"--sa-shards {s} leaves ~{need / s / 1e6:.0f} MB of index "
                f"per device but only {usable / 1e6:.0f} MB is usable: "
                f"use --sa-shards {min_shards} or more")
        return s
    import jax
    n_dev = jax.device_count()
    if min_shards > n_dev:
        raise BudgetError(
            f"corpus index needs >= {min_shards} shards of "
            f"~{need / min_shards / 1e6:.0f} MB but only {n_dev} devices "
            f"are visible")
    return int(min_shards)
