"""Marked-slow >=1 Mb full-pipeline scale test (VERDICT r3 Next #1).

Guards the scale path against silent regression: simulate a 1 Mb genome at
60x frag + 30x jump and run the FULL pipeline (the same driver as
scripts/run_scale.py), asserting assembly quality and bounded wall-clock.

Runs on the default test platform (virtual CPU mesh, conftest.py) so it is
slow (~tens of minutes) — excluded from the default suite via the `slow`
marker (pyproject addopts `-m 'not slow'`); run explicitly with:

    python -m pytest tests/test_scale_1mb.py -m slow -q
"""

import numpy as np
import pytest

from allpathslg_tpu.eval import stats
from allpathslg_tpu.pipeline.config import AssemblyConfig
from allpathslg_tpu.pipeline.rundir import RunDir
from allpathslg_tpu.pipeline.run import prepare_sim_inputs
from allpathslg_tpu.pipeline.stages import Pipeline


@pytest.mark.slow
def test_pipeline_1mb_scale(tmp_path):
    G = 1_000_000
    rd = RunDir(str(tmp_path))
    log = lambda *a: None
    prepare_sim_inputs(rd, G, 60.0, 0.01, 100, 7, log,
                       jump_coverage=30.0, jump_insert=3000, jump_sd=300)
    cfg = AssemblyConfig.from_overrides()
    pipe = Pipeline(rd, cfg, log)
    report = pipe.run_full()

    assert report["total_bases"] > 0.95 * G, report
    assert report["total_bases"] < 1.1 * G, report
    # jump scaffolding at 3 kb inserts must bridge nearly everything
    assert report["n50"] > 100_000, report

    # base-level accuracy vs truth
    u = rd.load_arrays("unibases")
    g = rd.load_arrays("genome_truth")["genome"]
    from allpathslg_tpu.eval import oracle
    K = 96
    lens = np.diff(u["offsets"])
    big = [u["bases"][u["offsets"][i]:u["offsets"][i + 1]]
           for i in range(len(lens)) if lens[i] >= 2 * K]
    gset = set(oracle.count_kmers([g], K).keys())
    n_bad = n_tot = 0
    for seq in big:
        ck = oracle.count_kmers([seq], K)
        n_tot += len(ck)
        n_bad += sum(1 for k in ck if k not in gset)
    assert n_bad <= 0.002 * max(n_tot, 1), (n_bad, n_tot)
