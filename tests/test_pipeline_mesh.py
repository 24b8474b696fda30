"""Mesh-distributed pipeline == 1-device pipeline, byte for byte.

VERDICT r3 Next #3: with `n_devices=8` (virtual CPU mesh, conftest), the
counting stages route through hash-sharded all_to_all counting
(parallel/dist_count) and the K=96 table build through the distributed
sample sort — and every artifact downstream must be BYTE-IDENTICAL to the
1-device run (ref: the reference's hash-parcel partitioning is a pure
reorganization of the same computation, KmerParcelsBuilder.cc).
"""

import numpy as np
import pytest

from allpathslg_tpu.pipeline.config import AssemblyConfig
from allpathslg_tpu.pipeline.rundir import RunDir
from allpathslg_tpu.pipeline.run import prepare_sim_inputs
from allpathslg_tpu.pipeline.stages import Pipeline


def _run(tmp, n_devices):
    rd = RunDir(str(tmp))
    log = lambda *a: None
    prepare_sim_inputs(rd, 20000, 40.0, 0.005, 100, 11, log,
                       jump_coverage=20.0, jump_insert=2000, jump_sd=200)
    cfg = AssemblyConfig.from_overrides(batch_reads=4096,
                                        n_devices=n_devices,
                                        stage_workers=1)
    pipe = Pipeline(rd, cfg, log)
    report = pipe.run_full()
    return rd, report


@pytest.fixture(scope="module")
def both_runs(tmp_path_factory):
    rd1, rep1 = _run(tmp_path_factory.mktemp("mesh1"), 1)
    rd8, rep8 = _run(tmp_path_factory.mktemp("mesh8"), 8)
    return rd1, rep1, rd8, rep8


def test_mesh_artifacts_byte_identical(both_runs):
    rd1, _, rd8, _ = both_runs
    for art, keys in [
        ("kspec_25mer", ["spectrum"]),
        ("frag_reads_edit", ["codes", "lengths"]),
        ("frag_reads_corr", ["codes", "lengths"]),
        ("unibases", ["bases", "offsets"]),
    ]:
        a1 = rd1.load_arrays(art)
        a8 = rd8.load_arrays(art)
        for k in keys:
            x1, x8 = np.asarray(a1[k]), np.asarray(a8[k])
            assert x1.shape == x8.shape, (art, k, x1.shape, x8.shape)
            assert x1.tobytes() == x8.tobytes(), (art, k)
    t1 = np.load(rd1.file_path("strong_table.npy"))
    t8 = np.load(rd8.file_path("strong_table.npy"))
    assert t1.shape == t8.shape
    assert t1.tobytes() == t8.tobytes()


def test_mesh_ec_zero_read_roundtrips(tmp_path):
    """VERDICT r4 Next 6: the mesh find_errors path must count from the
    RESIDENT packed batches — the only read-set download is the final
    artifact save, regardless of how many EC rounds ran."""
    rd = RunDir(str(tmp_path / "meshec"))
    log = lambda *a: None
    prepare_sim_inputs(rd, 20000, 40.0, 0.01, 100, 5, log)
    cfg = AssemblyConfig.from_overrides(batch_reads=4096, n_devices=8,
                                        stage_workers=1,
                                        round_checkpoints=False)
    pipe = Pipeline(rd, cfg, log)
    pipe.remove_dodgy()
    pipe.precorrect()
    db = pipe._read_cache["frag_reads_prec"]
    before = getattr(db, "n_host_downloads", 0)
    m = pipe.find_errors()
    assert m["n_corrections"] > 0
    after = getattr(db, "n_host_downloads", 0)
    assert after - before == 1, (before, after)  # only the artifact save


def test_mesh_report_identical(both_runs):
    _, rep1, _, rep8 = both_runs
    for k in ("contig_n50", "scaffold_n50", "total_bases", "n_contigs"):
        if k in rep1 or k in rep8:
            assert rep1.get(k) == rep8.get(k), k
