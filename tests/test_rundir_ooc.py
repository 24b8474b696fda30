"""Out-of-core artifact store (.arrd big form; VirtualMasterVec analog)."""

import numpy as np

from allpathslg_tpu.pipeline.rundir import RunDir


def test_big_form_roundtrip_and_mmap(tmp_path, monkeypatch):
    rd = RunDir(str(tmp_path))
    monkeypatch.setattr(RunDir, "BIG_BYTES", 1024)
    codes = np.arange(5000, dtype=np.uint8).reshape(50, 100)
    lengths = np.full(50, 100, np.int32)
    rd.save_arrays("reads_big", codes=codes, lengths=lengths)
    assert (tmp_path / "reads_big.arrd").is_dir()
    assert rd.has("reads_big")

    a = rd.load_arrays("reads_big")
    np.testing.assert_array_equal(a["codes"], codes)

    m = rd.load_arrays("reads_big", mmap=True)
    assert isinstance(m["codes"], np.memmap)
    np.testing.assert_array_equal(np.asarray(m["codes"][10:12]), codes[10:12])
    assert not m["codes"].flags.writeable

    fp = rd.fingerprint("reads_big")
    assert fp != "missing" and "codes" in fp


def test_small_form_unchanged(tmp_path):
    rd = RunDir(str(tmp_path))
    rd.save_arrays("tiny", x=np.arange(4))
    assert (tmp_path / "tiny.npz").exists()
    assert not (tmp_path / "tiny.arrd").exists()
    np.testing.assert_array_equal(rd.load_arrays("tiny")["x"], np.arange(4))


def test_form_transition_replaces_stale(tmp_path, monkeypatch):
    rd = RunDir(str(tmp_path))
    rd.save_arrays("art", x=np.arange(4))
    monkeypatch.setattr(RunDir, "BIG_BYTES", 16)
    rd.save_arrays("art", x=np.arange(100))       # now big form
    assert not (tmp_path / "art.npz").exists()
    np.testing.assert_array_equal(rd.load_arrays("art")["x"], np.arange(100))
    monkeypatch.setattr(RunDir, "BIG_BYTES", 1 << 30)
    rd.save_arrays("art", x=np.arange(7))          # back to small form
    assert not (tmp_path / "art.arrd").exists()
    np.testing.assert_array_equal(rd.load_arrays("art")["x"], np.arange(7))


def test_stage_done_accepts_big_form_output(tmp_path, monkeypatch):
    rd = RunDir(str(tmp_path))
    monkeypatch.setattr(RunDir, "BIG_BYTES", 64)
    rd.save_arrays("out_art", x=np.zeros(1000, np.int64))
    rd.mark_done("stage_x", "h1", ["out_art.npz"])
    assert rd.stage_done("stage_x", "h1", ["out_art.npz"])
    assert not rd.stage_done("stage_x", "h2", ["out_art.npz"])
