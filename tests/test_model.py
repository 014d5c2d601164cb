"""North-star model vectors (reference test_fhe.py, test_fixed_similarity.py,
test_polynomial_similarity.py — made deterministic).

* y = 2x: a one-weight linear model evaluated under real encryption must
  agree with the clear path to quantization precision (reference
  test_fhe.py:44-60: FHE predict(7) ~ 14 within 0.01).
* probe identities: identical -> ~1, orthogonal -> ~0, opposite -> ~-1
  (reference test_fixed_similarity.py:80-114).
* clear-vs-encrypted agreement on the seed-42 dataset (reference
  test_fhe_workflow.py:91-104).
"""

import numpy as np
import pytest

from fhe_icp_tpu.models.similarity import FHESimilarityModel
from fhe_icp_tpu.ops.params import CryptoParams
from fhe_icp_tpu.ops.runtime import FheRuntime

TEST_PARAMS = CryptoParams("test-512", n=512, n_limbs=3, allow_insecure=True)


@pytest.fixture(scope="module")
def rt():
    r = FheRuntime(TEST_PARAMS)
    r.generate_keys(seed=0)
    return r


@pytest.fixture(scope="module")
def model(rt):
    m = FHESimilarityModel(input_dim=128, n_bits=8)
    m.train()
    m.compile(runtime=rt)
    return m


def test_y_equals_2x_exact(rt):
    """w.x with w=[2], x=[7] under encryption -> exactly 14."""
    ct = rt.encrypt_vector(np.asarray([7], dtype=np.int32), seed=1)
    score = rt.dot_ct_pt(ct, np.asarray([2], dtype=np.int32))
    assert int(rt.decrypt_dot(score, 1)) == 14


def test_model_trains_r2(model):
    assert model.metrics["r2"] > 0.999


def test_circuit_bits_reported(model):
    # 128 * 2^7 * 2^7 accumulator -> 22-bit circuit (reference reports 20
    # for its n_bits=8 config — SESSION_REPORT.md:70).
    assert 18 <= model.metrics["circuit_max_bits"] <= 24


def test_probe_identities(model):
    d = model.input_dim
    rng = np.random.default_rng(7)
    e = rng.standard_normal(d)
    e /= np.linalg.norm(e)
    f = rng.standard_normal(d)
    f -= (f @ e) * e                       # orthogonalize
    f /= np.linalg.norm(f)

    probes = {
        "identical": (e * e, 1.0),
        "orthogonal": (e * f, 0.0),
        "opposite": (e * -e, -1.0),
    }
    for name, (x, want) in probes.items():
        got = float(model.predict_encrypted(x[None])[0])
        assert abs(got - want) < 0.05, f"{name}: {got} vs {want}"


def test_clear_vs_encrypted_agreement(model):
    from fhe_icp_tpu.analysis.quantization import create_similarity_dataset
    x, y = create_similarity_dataset(n_samples=8, dim=model.input_dim)
    clear = model.predict_clear(x)
    enc = np.asarray(model.predict_encrypted(x))
    assert np.abs(clear - enc).max() < 0.02
    # And the quantized-clear simulation is EXACTLY the encrypted result.
    sim = model.predict_quantized_clear(x)
    assert np.allclose(sim, enc, atol=1e-9)


def test_save_load_roundtrip(tmp_path, model, rt):
    path = tmp_path / "model"
    model.save(path)
    loaded = FHESimilarityModel.load(path, runtime=rt)
    x = np.linspace(-0.05, 0.05, model.input_dim)[None]
    assert np.allclose(loaded.predict_clear(x), model.predict_clear(x))
    assert np.allclose(np.asarray(loaded.predict_encrypted(x)),
                       np.asarray(model.predict_encrypted(x)))


# -- polynomial-kernel family (models/poly.py): the reference's
#    similarity_alternatives.py polynomial metric, but evaluated FULLY
#    under encryption (depth-2 ct x ct) -----------------------------------


class TestPolynomialFamily:
    @pytest.fixture(scope="class")
    def poly(self):
        from fhe_icp_tpu.models.poly import FHEPolynomialSimilarity
        rt5 = FheRuntime("test-512-poly")
        rt5.generate_keys(seed=0)
        m = FHEPolynomialSimilarity(input_dim=64, preset="test-512-poly",
                                    scale=90)
        m.compile(runtime=rt5)
        return m

    def test_encrypted_exactly_equals_quantized_clear(self, poly):
        rng = np.random.default_rng(7)
        for i in range(3):
            a, b = rng.standard_normal(64), rng.standard_normal(64)
            assert poly.predict_encrypted(a, b, seed=10 + i) == \
                poly.predict_quantized_clear(a, b)

    def test_probe_identities(self, poly):
        """identical -> 1, opposite -> 0, orthogonal -> 0.25 (reference
        test_polynomial_similarity.py probe semantics for
        ((1+cos)/2)^2)."""
        rng = np.random.default_rng(8)
        a = rng.standard_normal(64)
        assert abs(poly.predict_encrypted(a, a, seed=20) - 1.0) < 0.02
        assert abs(poly.predict_encrypted(a, -a, seed=21) - 0.0) < 0.02
        o = rng.standard_normal(64)
        o -= (o @ a) / (a @ a) * a                     # orthogonalize
        assert abs(poly.predict_encrypted(a, o, seed=22) - 0.25) < 0.03

    def test_tracks_clear_path(self, poly):
        rng = np.random.default_rng(9)
        for i in range(3):
            a, b = rng.standard_normal(64), rng.standard_normal(64)
            assert abs(poly.predict_encrypted(a, b, seed=30 + i)
                       - poly.predict_clear(a, b)) < 0.03

    def test_compile_rejections(self):
        from fhe_icp_tpu.models.poly import FHEPolynomialSimilarity
        with pytest.raises(ValueError, match="degree=2"):
            FHEPolynomialSimilarity(degree=3)
        with pytest.raises(ValueError, match="power of two"):
            FHEPolynomialSimilarity(input_dim=100)
        m = FHEPolynomialSimilarity(input_dim=64, preset="test-512-mult",
                                    scale=90)
        with pytest.raises(ValueError, match="needs >= 5"):
            rt3 = FheRuntime("test-512-mult")
            rt3.generate_keys(seed=0)
            m.compile(runtime=rt3)
        big = FHEPolynomialSimilarity(input_dim=64, preset="test-512-poly",
                                      scale=5000)
        with pytest.raises(ValueError, match="exceeds t/2"):
            rt5 = FheRuntime("test-512-poly")
            rt5.generate_keys(seed=0)
            big.compile(runtime=rt5)

    def test_save_load_roundtrip(self, poly, tmp_path):
        from fhe_icp_tpu.models.poly import FHEPolynomialSimilarity
        poly.save(tmp_path / "poly")
        m2 = FHEPolynomialSimilarity.load(tmp_path / "poly",
                                          runtime=poly.runtime)
        assert (m2.input_dim, m2.scale, m2.preset) == \
            (poly.input_dim, poly.scale, poly.preset)
        rng = np.random.default_rng(11)
        a, b = rng.standard_normal(64), rng.standard_normal(64)
        assert m2.predict_quantized_clear(a, b) == \
            poly.predict_quantized_clear(a, b)


@pytest.mark.slow
def test_polynomial_family_production_preset():
    """Full-dim (128) polynomial kernel at mult-8192: encrypted result
    EXACTLY equals the integer simulation, and tracks the clear kernel."""
    from fhe_icp_tpu.models.poly import FHEPolynomialSimilarity
    m = FHEPolynomialSimilarity(input_dim=128, preset="mult-8192", scale=90)
    m.compile()
    rng = np.random.default_rng(12)
    a, b = rng.standard_normal(128), rng.standard_normal(128)
    enc = m.predict_encrypted(a, b, seed=40)
    assert enc == m.predict_quantized_clear(a, b)
    assert abs(enc - m.predict_clear(a, b)) < 0.03
