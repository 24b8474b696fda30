"""IntDistribution, EdgeGraph components, tools CLI smoke tests."""

import json
import numpy as np
import pytest

from allpathslg_tpu.graph.digraph import EdgeGraph, connected_components, \
    components_as_lists
from allpathslg_tpu.utils.intdist import IntDistribution


def test_intdistribution_roundtrip():
    rng = np.random.default_rng(0)
    samples = rng.normal(3000, 250, 5000).astype(int)
    d = IntDistribution.from_samples(samples)
    assert abs(d.mean() - 3000) < 30
    assert abs(d.sd() - 250) < 40
    assert abs(d.quantile(0.5) - 3000) < 40


def test_intdistribution_mle_gap():
    rng = np.random.default_rng(1)
    insert = rng.normal(3000, 200, 3000).astype(int)
    d = IntDistribution.from_samples(insert)
    true_gap = 740
    spans = rng.normal(3000 - true_gap, 200, 60).astype(int)
    g, ll = d.mle_gap(spans, 0, 2000)
    assert abs(g - true_gap) < 80, g


def test_connected_components():
    rng = np.random.default_rng(2)
    # three chains + isolated vertices
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (20, 21)]
    src = np.array([e[0] for e in edges], np.int32)
    dst = np.array([e[1] for e in edges], np.int32)
    g = EdgeGraph(25, src, dst)
    lab = connected_components(g)
    assert lab[0] == lab[3] == 0
    assert lab[10] == lab[12] == 10
    assert lab[20] == lab[21] == 20
    assert lab[5] == 5  # isolated
    comps = components_as_lists(g)
    sizes = sorted(len(c) for c in comps)
    assert sizes[-3:] == [2, 3, 4]


def test_tools_cli_stats_and_search(tmp_path):
    from allpathslg_tpu import tools
    from allpathslg_tpu.io import fasta as fio
    from allpathslg_tpu.eval import sim
    from allpathslg_tpu.dtypes.reads import string_from_codes

    ref = str(tmp_path / "ref.fasta")
    g = sim.random_genome(5000, seed=3)
    fio.write_fasta(ref, [("chr", g)])
    fq = str(tmp_path / "r.fastq")
    rc = tools.main(["simulate", ref, "--out", fq, "--coverage", "5"])
    assert rc == 0
    rc = tools.main(["stats", fq])
    assert rc == 0
    rc = tools.main(["search", ref, string_from_codes(g[100:130])])
    assert rc == 0
