"""bench_cli smoke test (the reference's bench tooling is exercised in CI
as scripts; ours is importable)."""

import json

from usearch_tpu.bench_cli import main


def test_bench_cli_synthetic(capsys):
    main(["--synthetic", "2000", "--ndim", "16", "--batch", "128"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    report = json.loads(out)
    assert report["vectors"] == 2000
    assert report["qps"] > 0
    assert report["add_per_second"] > 0


def test_bench_cli_files(tmp_path, capsys):
    import numpy as np

    from usearch_tpu.io import save_matrix
    from usearch_tpu.exact import exact_search

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((500, 16)).astype(np.float32)
    queries = vecs[:32].copy()
    gt = exact_search(vecs, queries, 10, metric="ip").keys.astype(np.int32)
    save_matrix(vecs, str(tmp_path / "base.fbin"))
    save_matrix(queries, str(tmp_path / "q.fbin"))
    save_matrix(gt, str(tmp_path / "gt.ibin"))

    main([
        "--vectors", str(tmp_path / "base.fbin"),
        "--queries", str(tmp_path / "q.fbin"),
        "--neighbors", str(tmp_path / "gt.ibin"),
        "--metric", "ip", "--quantization", "f32", "-k", "10",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["recall_at_k"] > 0.99
    assert report["recall_at_1"] > 0.99
