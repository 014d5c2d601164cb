"""Production-preset (`pairwise-4096`) integration + noise-budget tests.

Round-2 shipped a benchmark break that 145 tests missed because every
test ran toy rings (test-512*): the default preset's compact plaintext
modulus T_COMPACT was never exercised at real size.  This file closes
that hole — it runs the REAL parameter set end to end the way the
reference runs its real compiled circuit in its own tests
(/root/reference/test_fhe_workflow.py:93-98):

    keygen -> encrypt -> ct x ct compare (+relinearize) -> packed MXU
    search -> homomorphic re-key

with every decrypted integer gated BIT-EXACT against the int64 oracle,
plus noise-budget assertions backing the claims in ops/params.py:112-117
(relinearization fits the 2-limb 2^62 budget) and ops/cipher.py (fine-
digit re-keying adds < 1 error unit).

It would have caught the round-2 bench break: `test_contract_bound`
asserts the exact failure mode (out-of-contract data wraps mod t) and
`test_packed_matvec_exact` is the bench's correctness gate in CI form.
"""

from __future__ import annotations

import numpy as np
import pytest

PRESET = "pairwise-4096"
DIM = 128


def quantized_unit(rng, shape):
    """Contract-range vectors: L2-normalized floats at scale 1000
    (utils/quantize.prepare_embedding_for_fhe without the metadata)."""
    v = rng.standard_normal(shape)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return np.round(v * 1000.0).astype(np.int32)


@pytest.fixture(scope="module")
def rt():
    from fhe_icp_tpu.ops.runtime import FheRuntime

    runtime = FheRuntime(PRESET)
    runtime.generate_keys(seed=7)
    return runtime


@pytest.mark.slow
class TestProductionPreset:
    def test_preset_is_secure_and_compact(self, rt):
        from fhe_icp_tpu.ops.params import T_COMPACT

        p = rt.params
        assert p.secure_128, "default preset must keep 128-bit security"
        assert p.t == T_COMPACT
        # The contract bound (|score| <= ~1.1e6 for scale-1000 unit
        # vectors) must sit well inside the decode range t/2 (~3.9x).
        assert p.t // 2 > 3 * 1_100_000

    def test_contract_bound(self, rt):
        """Scale-1000 quantized unit vectors stay inside T_COMPACT/2;
        unnormalized integer vectors do NOT — the round-2 bench bug."""
        rng = np.random.default_rng(0)
        a = quantized_unit(rng, (256, DIM)).astype(np.int64)
        b = quantized_unit(rng, (256, DIM)).astype(np.int64)
        dots = np.abs((a * b).sum(-1))
        assert dots.max() < rt.params.t // 2
        # Out-of-contract data exceeds the range (documented failure).
        raw = rng.integers(-1000, 1001, size=(256, DIM)).astype(np.int64)
        raw2 = rng.integers(-1000, 1001, size=(256, DIM)).astype(np.int64)
        assert np.abs((raw * raw2).sum(-1)).max() > rt.params.t // 2

    def test_fresh_encrypt_decrypt_exact(self, rt):
        rng = np.random.default_rng(1)
        docs = quantized_unit(rng, (4, DIM))
        cts = rt.encrypt_vector(docs, seed=11)
        dec = np.asarray(rt.decrypt(cts))
        assert (dec[:, :DIM] == docs).all()
        assert (dec[:, DIM:] == 0).all()

    def test_fresh_noise_budget(self, rt):
        """Fresh ciphertexts at pairwise-4096 carry ample headroom."""
        from fhe_icp_tpu.ops import noise

        rng = np.random.default_rng(2)
        ct = rt.encrypt_vector(quantized_unit(rng, (DIM,)), seed=12)
        budget = noise.noise_budget_bits(rt.ctx, rt.keys.sk, ct)
        # q ~ 2^62, fresh phase ~ t * e ~ 2^23 * 2^5 -> ~30+ bits free.
        assert budget >= 25, f"fresh budget only {budget} bits"

    def test_ct_x_ct_compare_exact_with_relin_budget(self, rt):
        """The `compare` path fully encrypted: tensor product +
        relinearization at the production preset, bit-exact, with the
        post-relin noise budget positive (params.py:112-117 claim)."""
        from fhe_icp_tpu.ops import noise

        rng = np.random.default_rng(3)
        a = quantized_unit(rng, (DIM,))
        b = quantized_unit(rng, (DIM,))
        ct_a = rt.encrypt_vector(a, seed=21)
        ct_b = rt.encrypt_vector(b, seed=22, rev=True)
        prod = rt.dot_ct_ct(ct_a, ct_b)             # mul + relinearize
        got = int(np.asarray(rt.decrypt_dot(prod, DIM)))
        want = int(a.astype(np.int64) @ b.astype(np.int64))
        assert got == want
        budget = noise.noise_budget_bits(rt.ctx, rt.keys.sk, prod)
        assert budget >= 2, (
            f"post-relin budget {budget} bits — the 2-limb 2^62 claim "
            f"(ops/params.py:112-117) does not hold")

    def test_packed_matvec_exact(self, rt):
        """The headline-bench correctness gate as a CI test: packed MXU
        scoring at pairwise-4096 over contract-range data, bit-exact
        (red under round-2's bench data, green under the contract)."""
        import jax
        import jax.numpy as jnp

        from fhe_icp_tpu.ops import pack

        ctx, sk = rt.ctx, rt.keys.sk
        slots = pack.slots_per_ct(ctx.n, DIM)       # 32
        groups = 2
        batch = groups * slots
        rng = np.random.default_rng(4)
        docs = quantized_unit(rng, (batch, DIM))
        query = quantized_unit(rng, (DIM,))

        polys = pack.encode_packed(
            jnp.asarray(docs.reshape(groups, slots, DIM)), ctx.n)
        ct = rt.encrypt(np.asarray(polys), seed=31)
        doc_op = jax.jit(lambda d: pack.make_packed_doc_operand(
            ctx, d, ct.level))(ct.data)
        q_op = pack.make_packed_query_operand(
            ctx, sk, jnp.asarray(query), DIM, ct.level)
        out = jax.jit(lambda a, b: pack.packed_scores(
            ctx, a, b, ct.pt_corr))(doc_op, q_op)
        got = np.asarray(out, dtype=np.int64).reshape(-1)
        want = docs.astype(np.int64) @ query.astype(np.int64)
        assert (got == want).all()

    def test_homomorphic_pack_then_score_exact(self, rt):
        """Store-side flow: per-doc ciphertexts packed HOMOMORPHICALLY
        (monomial multiplies, ops/pack.py) then scored — exact."""
        import jax
        import jax.numpy as jnp

        from fhe_icp_tpu.ops import pack

        ctx, sk = rt.ctx, rt.keys.sk
        slots = pack.slots_per_ct(ctx.n, DIM)
        rng = np.random.default_rng(5)
        docs = quantized_unit(rng, (slots, DIM))    # one packed group
        query = quantized_unit(rng, (DIM,))

        cts = rt.encrypt_vector(docs, seed=41)      # (S, 2, L, N) fwd
        packed = jax.jit(lambda d: pack.pack_ciphertexts(
            ctx, d, DIM, cts.level))(cts.data)
        doc_op = jax.jit(lambda d: pack.make_packed_doc_operand(
            ctx, d, cts.level))(packed)
        q_op = pack.make_packed_query_operand(
            ctx, sk, jnp.asarray(query), DIM, cts.level)
        out = jax.jit(lambda a, b: pack.packed_scores(
            ctx, a, b))(doc_op, q_op)
        got = np.asarray(out, dtype=np.int64).reshape(-1)
        want = docs.astype(np.int64) @ query.astype(np.int64)
        assert (got == want).all()

    def test_rekey_exact_and_fresh_quality(self, rt):
        """Homomorphic re-keying at the production preset: bit-exact
        under the new key, rejected by the old, and near-fresh noise.

        Measured cost at pairwise-4096: 2 bits of budget.  The fine
        16-bit digits contribute ~2^-15 error units, but the divide-by-P
        rounding of the hybrid keyswitch adds ~0.5 error units per
        coefficient which lands on the ciphertext through s (ternary,
        ~sqrt(N) spread) — a few fresh-noise multiples, NOT free.  3 bits
        is the regression bound; anything worse means the keyswitch is
        broken."""
        import jax

        from fhe_icp_tpu.ops import arith, noise
        from fhe_icp_tpu.ops.cipher import rekey_keygen
        from fhe_icp_tpu.ops.runtime import FheRuntime

        ctx = rt.ctx
        rt2 = FheRuntime(rt.params)
        rt2.generate_keys(seed=8)

        rng = np.random.default_rng(6)
        doc = quantized_unit(rng, (DIM,))
        ct = rt.encrypt_vector(doc, seed=51)
        before = noise.noise_budget_bits(ctx, rt.keys.sk, ct)

        ksks = jax.jit(lambda k: rekey_keygen(
            ctx, k, rt.keys.sk, rt2.keys.sk))(jax.random.PRNGKey(9))
        ct2 = jax.jit(lambda x: arith.rekey(ctx, ksks[ct.level], x))(ct)
        dec = np.asarray(rt2.decrypt(ct2))
        assert (dec[:DIM] == doc).all()
        assert not (np.asarray(rt.decrypt(ct2))[:DIM] == doc).all()

        after = noise.noise_budget_bits(ctx, rt2.keys.sk, ct2)
        assert after >= before - 3, (
            f"re-key cost {before - after} bits — fine-digit hybrid "
            f"keyswitch should stay within a few fresh-noise multiples")

    def test_rekeyed_ct_still_multiplication_grade(self, rt):
        """A re-keyed ciphertext must survive a full ct x ct compare —
        the property that makes rotation migration lossless."""
        import jax

        from fhe_icp_tpu.ops import arith
        from fhe_icp_tpu.ops.cipher import rekey_keygen
        from fhe_icp_tpu.ops.runtime import FheRuntime

        ctx = rt.ctx
        rt2 = FheRuntime(rt.params)
        rt2.generate_keys(seed=13)

        rng = np.random.default_rng(7)
        a = quantized_unit(rng, (DIM,))
        b = quantized_unit(rng, (DIM,))
        ct_a = rt.encrypt_vector(a, seed=61)
        ct_b = rt.encrypt_vector(b, seed=62, rev=True)
        ksks = jax.jit(lambda k: rekey_keygen(
            ctx, k, rt.keys.sk, rt2.keys.sk))(jax.random.PRNGKey(14))
        ct_a2 = jax.jit(lambda x: arith.rekey(ctx, ksks[ct_a.level], x))(ct_a)
        ct_b2 = jax.jit(lambda x: arith.rekey(ctx, ksks[ct_b.level], x))(ct_b)

        prod = rt2.dot_ct_ct(ct_a2, ct_b2)
        got = int(np.asarray(rt2.decrypt_dot(prod, DIM)))
        assert got == int(a.astype(np.int64) @ b.astype(np.int64))
