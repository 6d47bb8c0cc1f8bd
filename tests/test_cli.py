"""CLI driver + data tools, end-to-end through the reference flag set."""

import numpy as np

from parlayann_tpu.data import io
from parlayann_tpu import cli
from parlayann_tpu.tools import compute_groundtruth, vec_to_bin, crop, random_sample


def test_cli_build_query_csv(tmp_path, rng):
    base = str(tmp_path / "b.fbin")
    qf = str(tmp_path / "q.fbin")
    gt = str(tmp_path / "gt.ibin")
    gout = str(tmp_path / "g.graph")
    res = str(tmp_path / "res.csv")
    io.write_bin(base, rng.standard_normal((600, 12)).astype(np.float32))
    io.write_bin(qf, rng.standard_normal((40, 12)).astype(np.float32))
    compute_groundtruth.main(
        ["-base_path", base, "-query_path", qf, "-gt_path", gt, "-k", "15"]
    )
    ids, dists = io.read_ibin(gt)
    assert ids.shape == (40, 15)

    rc = cli.main(
        ["-base_path", base, "-query_path", qf, "-gt_path", gt,
         "-R", "12", "-L", "24", "-alpha", "1.2",
         "-graph_outfile", gout, "-res_path", res, "-Q", "24"]
    )
    assert rc == 0
    g = io.read_graph(gout)
    assert g[2] == 12  # max degree
    csv_text = open(res).read()
    assert "GRAPH" in csv_text and "vamana" in csv_text

    # query-only mode with the saved graph
    rc = cli.main(
        ["-base_path", base, "-query_path", qf, "-gt_path", gt,
         "-graph_path", gout, "-Q", "24"]
    )
    assert rc == 0


def test_tools_roundtrip(tmp_path, rng):
    x = rng.standard_normal((30, 6)).astype(np.float32)
    fv = str(tmp_path / "x.fvecs")
    with open(fv, "wb") as f:
        for row in x:
            np.array([6], np.int32).tofile(f)
            row.tofile(f)
    out = str(tmp_path / "x.fbin")
    vec_to_bin.main([fv, out])
    np.testing.assert_array_equal(io.read_bin(out), x)
    cropf = str(tmp_path / "c.fbin")
    crop.main([out, cropf, "-n", "10"])
    assert io.read_bin(cropf).shape == (10, 6)
    sampf = str(tmp_path / "s.fbin")
    random_sample.main([out, sampf, "-n", "5"])
    assert io.read_bin(sampf).shape == (5, 6)


def test_cli_cluster_index(tmp_path, rng):
    """-algorithm cluster: build, save, probe sweep, CSV, reload."""
    base = str(tmp_path / "b.fbin")
    qf = str(tmp_path / "q.fbin")
    gt = str(tmp_path / "gt.ibin")
    cout = str(tmp_path / "ci.npz")
    res = str(tmp_path / "res.csv")
    # clustered data so a fixed probe count reaches high recall
    centers = rng.standard_normal((12, 16)).astype(np.float32)
    x = (centers[rng.integers(0, 12, 800)]
         + 0.05 * rng.standard_normal((800, 16))).astype(np.float32)
    q = (centers[rng.integers(0, 12, 40)]
         + 0.05 * rng.standard_normal((40, 16))).astype(np.float32)
    io.write_bin(base, x)
    io.write_bin(qf, q)
    compute_groundtruth.main(
        ["-base_path", base, "-query_path", qf, "-gt_path", gt, "-k", "10"]
    )
    rc = cli.main(
        ["-base_path", base, "-query_path", qf, "-gt_path", gt,
         "-algorithm", "cluster", "-cluster_m", "16",
         "-graph_outfile", cout, "-res_path", res, "-Q", "8"]
    )
    assert rc == 0
    csv_text = open(res).read()
    assert "cluster" in csv_text
    # reload path
    rc = cli.main(
        ["-base_path", base, "-query_path", qf, "-gt_path", gt,
         "-algorithm", "cluster", "-graph_path", cout, "-Q", "8"]
    )
    assert rc == 0


def test_cli_quantize_modes(tmp_path, rng):
    """-quantize 1..3 (Euclidian) and 3..4 (mips) dispatch the two-level
    tiers exactly as vamana/neighbors.h:117-186."""
    base = str(tmp_path / "b.fbin")
    qf = str(tmp_path / "q.fbin")
    gt = str(tmp_path / "gt.ibin")
    gout = str(tmp_path / "g.graph")
    io.write_bin(base, rng.standard_normal((500, 16)).astype(np.float32))
    io.write_bin(qf, rng.standard_normal((20, 16)).astype(np.float32))
    compute_groundtruth.main(
        ["-base_path", base, "-query_path", qf, "-gt_path", gt, "-k", "10"]
    )
    # build once, reuse the graph across modes
    rc = cli.main(["-base_path", base, "-R", "12", "-L", "24",
                   "-alpha", "1.2", "-graph_outfile", gout])
    assert rc == 0
    for dist, modes in (("Euclidian", (1, 2, 3)), ("mips", (3, 4))):
        for mode in modes:
            rc = cli.main(
                ["-base_path", base, "-query_path", qf, "-gt_path", gt,
                 "-graph_path", gout, "-dist_func", dist,
                 "-quantize", str(mode), "-Q", "24"]
            )
            assert rc == 0, (dist, mode)
