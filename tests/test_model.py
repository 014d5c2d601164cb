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
