"""Analysis modules: linear-math proof, metric correlations, debug utils."""
import jax

import numpy as np

from fhe_icp_tpu.analysis.alternatives import FHEFriendlySimilarity, benchmark
from fhe_icp_tpu.analysis.linear_math import (analyze_linear_relationship,
                                              probe_identities)
from fhe_icp_tpu.utils.debug import check_environment, memory_monitor


def test_concat_cannot_learn_cosine_products_can():
    r2 = analyze_linear_relationship(n_samples=1500, dim=32)
    assert r2["product"] > 0.9999          # exact by construction
    assert r2["concat"] < 0.1              # provably impossible


def test_probe_identities():
    assert probe_identities() == {
        "identical": 1.0, "orthogonal": 0.0, "opposite": -1.0}


def test_metric_correlations(tmp_path):
    corr = benchmark(n_pairs=300, dim=64,
                     out_path=str(tmp_path / "metrics.json"))
    assert corr["dot"] > 0.9999            # == cosine for unit vectors
    assert corr["manhattan"] > 0.95        # reference: 99.15%
    assert corr["approx_cosine"] > 0.99    # reference: 99.97%
    assert corr["polynomial"] > 0.95       # reference: 99.75%
    assert (tmp_path / "metrics.json").exists()


def test_similarity_metric_values():
    a = np.asarray([1.0, 0.0])
    b = np.asarray([0.0, 1.0])
    s = FHEFriendlySimilarity
    assert s.cosine(a, a) == 1.0
    assert s.cosine(a, b) == 0.0
    assert s.dot(a, -a) == -1.0
    assert s.manhattan(a, a) == 1.0
    assert s.hamming_sign(a, a) == 1.0
    assert abs(s.approx_cosine(a, a) - 1.0) < 1e-9


def test_check_environment_reports():
    info = check_environment(verbose=False)
    assert info["jax_backend"] in ("cpu", "tpu", "gpu", "axon")
    assert info["numpy_version"]
    assert "ram_gb" in info


def test_memory_monitor_decorator(caplog):
    @memory_monitor
    def alloc():
        return np.zeros(1_000_000)

    import logging
    with caplog.at_level(logging.INFO, logger="fhe_icp_tpu.utils.debug"):
        alloc()
    assert any("alloc:" in r.message for r in caplog.records)


def test_reduction_sweep(tmp_path, monkeypatch):
    import os
    monkeypatch.chdir(tmp_path)
    from fhe_icp_tpu.analysis.reduction import make_corpus, run_sweep
    x = make_corpus(n=128, dim=256)
    results = run_sweep(corpus=x, target_dims=(32, 128),
                        out_path=str(tmp_path / "sweep.json"))
    assert len(results) == 6
    pca128 = next(r for r in results
                  if r["method"] == "pca" and r["target_dim"] == 128)
    assert pca128["similarity_preservation"] > 0.9   # low-rank corpus
    assert pca128["explained_variance"] > 0.8
    assert (tmp_path / "sweep.json").exists()
    assert (tmp_path / "pca_reducer_128.npz").exists()


def test_profiling_utils():
    import jax.numpy as jnp
    from fhe_icp_tpu.utils.profiling import Metrics, measure, roofline

    f = jax.jit(lambda x: (x * 2).sum())
    x = jnp.arange(1 << 16, dtype=jnp.int32)
    m = measure(f, x, iters=4)
    assert m["ms"] > 0
    r = roofline(f, x, bytes_accessed=x.size * 4, items=x.size, iters=4)
    assert r["gb_per_s"] > 0 and r["items_per_s"] > 0

    reg = Metrics()
    reg.log("ops_per_s", 123.0, config="test")
    assert reg.latest("ops_per_s") == 123.0
    assert "ops_per_s" in reg.to_json()
