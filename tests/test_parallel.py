"""Multi-chip sharding tests on the 8-virtual-device CPU mesh.

The reference has no distributed execution (SURVEY.md §2.3); these tests
validate that the sharded encrypted-search programs compile and produce
bit-exact results under real dp/tp shardings — the 'test multi-node
without a cluster' mechanism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fhe_icp_tpu.ops import fastdot
from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime
from fhe_icp_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from fhe_icp_tpu.parallel.search import (doc_operand_sharding,
                                         make_sharded_fastdot_search,
                                         make_sharded_search)

TEST_PARAMS = CryptoParams("test-512", n=512, n_limbs=2, allow_insecure=True)
RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime(TEST_PARAMS)
    r.generate_keys(seed=0)
    return r


def _docs_query(rt, batch, d):
    docs = jnp.asarray(RNG.integers(-1000, 1001, size=(batch, d)),
                       dtype=jnp.int32)
    q = jnp.asarray(RNG.integers(-1000, 1001, size=(d,)), dtype=jnp.int32)
    cts = rt.encrypt_vector(docs, seed=31)
    truth = np.asarray(docs, np.int64) @ np.asarray(q, np.int64)
    return docs, q, cts, truth


def test_device_count():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_sharded_search_exact(rt, shape):
    d, batch, k = 128, 16, 3
    mesh = make_mesh(8, shape=shape)
    _, q, cts, truth = _docs_query(rt, batch, d)
    step = make_sharded_search(rt.ctx, rt.keys.sk, mesh, d=d,
                               level=rt.ctx.n_limbs, top_k=k)
    data = jax.device_put(cts.data, batch_sharding(mesh))
    scores, vals, idx = step(data, q)
    assert (np.asarray(scores, np.int64) == truth).all()
    order = np.argsort(-truth)[:k]
    assert (np.asarray(vals, np.int64) == truth[order]).all()


def test_sharded_fastdot_search_exact(rt):
    d, batch, k = 128, 32, 5
    mesh = make_mesh(8, shape=(8, 1))
    _, q, cts, truth = _docs_query(rt, batch, d)
    ctx, sk = rt.ctx, rt.keys.sk
    doc_op = fastdot.make_doc_operand(ctx, cts.data, cts.level)
    q_op = fastdot.make_query_operand(ctx, sk, q, d, cts.level)
    step = make_sharded_fastdot_search(ctx, mesh, top_k=k)
    digits = jax.device_put(doc_op.digits, doc_operand_sharding(mesh))
    scores, vals, idx = step(digits, q_op.digits)
    assert (np.asarray(scores, np.int64) == truth).all()
    order = np.argsort(-truth)[:k]
    assert (np.asarray(vals, np.int64) == truth[order]).all()
    assert (truth[np.asarray(idx)] == truth[order]).all()


def test_sharded_packed_search_exact(rt):
    """Slot-packed sharded search: S docs/ciphertext, exact scores + top-k."""
    from fhe_icp_tpu.ops import pack
    from fhe_icp_tpu.parallel.search import make_sharded_packed_search

    d, k = 64, 5
    ctx, sk = rt.ctx, rt.keys.sk
    slots = pack.slots_per_ct(ctx.n, d)            # 8 at N=512
    batch = 8 * slots                              # one group per device
    mesh = make_mesh(8, shape=(8, 1))
    docs, q, cts, truth = _docs_query(rt, batch, d)
    packed = pack.pack_ciphertexts(ctx, cts.data, d, cts.level)
    doc_op = pack.make_packed_doc_operand(ctx, packed, cts.level)
    q_op = pack.make_packed_query_operand(ctx, sk, q, d, cts.level)
    from fhe_icp_tpu.parallel.search import packed_operand_sharding
    step = make_sharded_packed_search(ctx, mesh, d=d, top_k=k)
    digits = jax.device_put(doc_op.digits, packed_operand_sharding(mesh))
    scores, vals, idx = step(digits, q_op.digits)
    assert (np.asarray(scores, np.int64)[:batch] == truth).all()
    order = np.argsort(-truth)[:k]
    assert (np.asarray(vals, np.int64) == truth[order]).all()


def test_sharded_matches_single_device(rt):
    """The sharded program and the single-device path agree bit-for-bit."""
    d, batch = 128, 8
    mesh = make_mesh(8, shape=(8, 1))
    _, q, cts, truth = _docs_query(rt, batch, d)
    single = np.asarray(
        rt.decrypt_dot(rt.matvec(cts, q), d), dtype=np.int64)
    step = make_sharded_search(rt.ctx, rt.keys.sk, mesh, d=d,
                               level=rt.ctx.n_limbs, top_k=2)
    sharded, _, _ = step(jax.device_put(cts.data, batch_sharding(mesh)), q)
    assert (np.asarray(sharded, np.int64) == single).all()


def test_sharded_packed_search_pad_masking(rt):
    """Zero-ciphertext operand padding must not outrank real (negative)
    scores: n_docs bounds the top-k ranking while scores stay raw."""
    from fhe_icp_tpu.ops import pack
    from fhe_icp_tpu.parallel.search import (make_sharded_packed_search,
                                             packed_operand_sharding)

    d, k = 64, 3
    ctx, sk = rt.ctx, rt.keys.sk
    slots = pack.slots_per_ct(ctx.n, d)
    batch = 8 * slots
    mesh = make_mesh(8, shape=(8, 1))
    # All-negative dot products: any unmasked zero-score pad doc would
    # win the ranking.
    docs = jnp.asarray(-RNG.integers(1, 500, size=(batch, d)),
                       dtype=jnp.int32)
    q = jnp.asarray(RNG.integers(1, 500, size=(d,)), dtype=jnp.int32)
    truth = np.asarray(docs, np.int64) @ np.asarray(q, np.int64)
    cts = rt.encrypt_vector(docs, seed=41)
    packed = pack.pack_ciphertexts(ctx, cts.data, d, cts.level)
    doc_op = pack.make_packed_doc_operand(ctx, packed, cts.level,
                                          pad_groups_to=16)  # 8 -> 16
    assert doc_op.groups == 16
    q_op = pack.make_packed_query_operand(ctx, sk, q, d, cts.level)
    step = make_sharded_packed_search(ctx, mesh, d=d, top_k=k,
                                      n_docs=batch)
    digits = jax.device_put(doc_op.digits, packed_operand_sharding(mesh))
    scores, vals, idx = step(digits, q_op.digits)
    assert (np.asarray(scores, np.int64)[:batch] == truth).all()
    order = np.argsort(-truth)[:k]
    assert (np.asarray(vals, np.int64) == truth[order]).all()
    assert (np.asarray(idx) < batch).all()


def test_topk_hierarchical_matches_full_sort():
    """Exact hierarchical top-k == lax.top_k on long vectors, incl. ties
    and negative scores."""
    import jax
    from fhe_icp_tpu.parallel.search import topk_hierarchical
    rng = np.random.default_rng(3)
    for n in (4096, 9000, 100_000):
        flat = jnp.asarray(rng.integers(-2**31 + 1, 2**31 - 1, size=(n,),
                                        dtype=np.int64).astype(np.int32))
        hv, hi = topk_hierarchical(flat, 5)
        fv, fi = jax.lax.top_k(flat, 5)
        assert (np.asarray(hv) == np.asarray(fv)).all()
        # values at indices must match (indices may differ only on ties)
        assert (np.asarray(flat)[np.asarray(hi)] == np.asarray(fv)).all()
