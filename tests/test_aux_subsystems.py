"""Aux subsystems: check mode, fault injection/resume, submission prep,
library coverage report (SURVEY.md §5)."""

import os

import numpy as np
import pytest

from allpathslg_tpu.pipeline.config import AssemblyConfig
from allpathslg_tpu.pipeline.rundir import RunDir
from allpathslg_tpu.pipeline.run import prepare_sim_inputs
from allpathslg_tpu.pipeline.stages import Pipeline


def _mk(tmp_path, **cfg_kw):
    rd = RunDir(str(tmp_path / "run"))
    if not rd.has("frag_reads_orig"):
        prepare_sim_inputs(rd, 30000, 40.0, 0.003, 100, 3,
                           lambda *a: None, jump_coverage=20.0,
                           jump_insert=2500, jump_sd=250)
    cfg = AssemblyConfig.from_overrides(K=48, **cfg_kw)
    return rd, Pipeline(rd, cfg, log=lambda *a: None)


def test_check_mode_validates_against_oracle(tmp_path):
    rd, pipe = _mk(tmp_path, check_mode=True, batch_reads=4096)
    m = pipe.validate_inputs()
    assert m["n_reads"] > 0  # ran without AssertionError


def test_fault_injection_then_resume(tmp_path):
    rd, pipe = _mk(tmp_path, fault_stage="find_errors", batch_reads=4096)
    pipe.validate_inputs()
    pipe.remove_dodgy()
    pipe.precorrect()
    with pytest.raises(RuntimeError, match="injected fault"):
        pipe.find_errors()
    # stage not marked done; earlier stages are
    assert "precorrect" in rd.manifest["stages"]
    assert "find_errors" not in rd.manifest["stages"]
    # resume without the fault: completed stages skip, failed one runs
    rd2 = RunDir(str(tmp_path / "run"))
    cfg = AssemblyConfig.from_overrides(K=48, batch_reads=4096)
    ran = []
    pipe2 = Pipeline(rd2, cfg, log=lambda *a: ran.append(" ".join(map(str, a))))
    pipe2.validate_inputs()
    pipe2.precorrect()
    pipe2.find_errors()
    assert any("up to date" in l for l in ran)
    assert "find_errors" in rd2.manifest["stages"]


def test_validate_per_library_spectra(tmp_path):
    """validate_inputs computes a K=25 spectrum for EVERY library — frag AND
    jump (ref: ValidateAllPathsInputs per-library 25-mer kspec) — and the
    artifact name matches the K actually computed."""
    rd, pipe = _mk(tmp_path, batch_reads=4096)
    m = pipe.validate_inputs()
    assert "libraries" in m and "frag" in m["libraries"]
    assert "jump0" in m["libraries"]
    jrow = m["libraries"]["jump0"]
    assert jrow["n_reads"] > 0 and jrow["n_kmers_distinct"] > 0
    a = rd.load_arrays("kspec_25mer")
    assert "spectrum" in a and "spectrum_jump0" in a
    # K=25 truly: distinct 25-mers ≈ genome size (small genome, tails differ)
    assert 0.7 < m["genome_size_est"] / 30000 < 1.3


def test_validate_rejects_malformed_jump_pairs(tmp_path):
    rd, pipe = _mk(tmp_path, batch_reads=4096)
    j = rd.load_arrays("jump_reads_orig")
    bad = {k: np.asarray(v) for k, v in j.items()}
    bad["pairs"] = bad["pairs"].copy()
    bad["pairs"][0, 1] = len(bad["lengths"]) + 5  # out of range
    rd.save_arrays("jump_reads_orig", **bad)
    with pytest.raises(ValueError, match="out of range"):
        pipe.validate_inputs()


def test_watchdog_trips_on_stalled_stage(tmp_path):
    """A deliberately-stalled stage must trip the wall-clock guard: the
    watchdog raises StageTimeout in the stage thread, the stage is NOT
    marked done, and the log carries the WATCHDOG line (VERDICT r4 weak 8)."""
    import time

    from allpathslg_tpu.pipeline.stages import StageTimeout

    lines = []
    rd = RunDir(str(tmp_path / "wrun"))
    cfg = AssemblyConfig.from_overrides(
        K=48, stage_timeout_s=1, stage_heartbeat_s=1)
    pipe = Pipeline(rd, cfg, log=lambda *a: lines.append(" ".join(map(str, a))))

    def stalled():
        for _ in range(600):
            time.sleep(0.05)  # python-level stall: async raise can land

    with pytest.raises(StageTimeout):
        pipe.run_stage("stalled_stage", "h0", [], stalled)
    assert any("WATCHDOG" in l for l in lines)
    assert "stalled_stage" not in rd.manifest["stages"]


def test_watchdog_heartbeat_logs_progress(tmp_path):
    import time

    lines = []
    rd = RunDir(str(tmp_path / "hrun"))
    cfg = AssemblyConfig.from_overrides(K=48, stage_heartbeat_s=1)
    pipe = Pipeline(rd, cfg, log=lambda *a: lines.append(" ".join(map(str, a))))
    pipe.run_stage("slow_stage", "h1", [], lambda: time.sleep(2.5))
    beats = [l for l in lines if "heartbeat" in l]
    assert beats, lines
    assert "slow_stage" in rd.manifest["stages"]


def test_find_errors_round_checkpoint_resume(tmp_path):
    """Intra-stage EC checkpoint (SURVEY §5.4): a crash between rounds
    resumes from the last completed round, and the resumed run's output is
    BYTE-IDENTICAL to an uninterrupted one."""
    import shutil

    # uninterrupted reference
    rd1, p1 = _mk(tmp_path / "a", batch_reads=4096,
                  ec_min_round_fixes_frac=0.0, ec_rounds=2)
    p1.remove_dodgy()
    p1.precorrect()
    p1.find_errors()
    ref = np.asarray(rd1.load_arrays("frag_reads_edit")["codes"])

    # interrupted at round 1, then resumed
    rd2, p2 = _mk(tmp_path / "b", batch_reads=4096,
                  ec_min_round_fixes_frac=0.0, ec_rounds=2,
                  fault_stage="find_errors@round1")
    p2.remove_dodgy()
    p2.precorrect()
    with pytest.raises(RuntimeError, match="round 1"):
        p2.find_errors()
    assert os.path.exists(rd2.file_path("find_errors_progress.npz"))
    lines = []
    cfg = AssemblyConfig.from_overrides(K=48, batch_reads=4096,
                                        ec_min_round_fixes_frac=0.0,
                                        ec_rounds=2)
    p2b = Pipeline(RunDir(str(tmp_path / "b" / "run")), cfg,
                   log=lambda *a: lines.append(" ".join(map(str, a))))
    p2b.find_errors()
    assert any("resuming at round 1" in l for l in lines), lines[-5:]
    got = np.asarray(p2b.rd.load_arrays("frag_reads_edit")["codes"])
    assert np.array_equal(ref, got)
    assert not os.path.exists(p2b.rd.file_path("find_errors_progress.npz"))


def test_cheat_mode_truth_diagnostics(tmp_path):
    """EVALUATION=CHEAT (ref: RunAllPathsLG EVALUATION=CHEAT guiding
    module internals): truth feeds INTO stage diagnostics — find_errors
    reports the true-kmer fraction before/after correction, unipaths
    reports mid-pipeline assembly accuracy vs truth."""
    rd, pipe = _mk(tmp_path, batch_reads=4096, evaluation="CHEAT")
    pipe.remove_dodgy()
    pipe.precorrect()
    m = pipe.find_errors()
    assert "cheat_true_kmer_frac_after" in m, m
    assert m["cheat_true_kmer_frac_after"] >= m["cheat_true_kmer_frac_before"]
    assert m["cheat_true_kmer_frac_after"] > 0.99
    pipe.clean_reads()
    pipe.fill_fragments()
    um = pipe.unipaths()
    assert "cheat_genome_covered_frac" in um, um
    assert um["cheat_genome_covered_frac"] > 0.9


def test_evaluation_none_skips(tmp_path):
    rd, pipe = _mk(tmp_path, batch_reads=4096, evaluation="NONE")
    pipe.run_full()
    assert rd.metrics("evaluate").get("skipped") == "EVALUATION=NONE"


def test_full_run_emits_submission_and_libcoverage(tmp_path):
    rd, pipe = _mk(tmp_path, batch_reads=8192)
    pipe.run_full()
    sub = os.path.join(rd.path, "submission")
    assert os.path.exists(os.path.join(sub, "contigs.fsa"))
    assert os.path.exists(os.path.join(sub, "assembly.agp"))
    assert os.path.exists(os.path.join(sub, "scaffolds.fsa"))
    m = rd.metrics("submission_prep")
    assert m["n_contigs_submitted"] >= 1
    with open(rd.file_path("assembly.report")) as f:
        rep = f.read()
    assert "library coverage:" in rep
    assert "frag" in rep
    # AGP sanity: every line has 9 columns, W rows reference contigs
    with open(os.path.join(sub, "assembly.agp")) as f:
        rows = [l.split("\t") for l in f if l.strip() and l[0] != "#"]
    assert rows and all(len(r) == 9 for r in rows)
    assert any(r[4] == "W" for r in rows)
