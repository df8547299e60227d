"""Tests for layouts and baseline machinery."""

import numpy as np
import pytest

from prisim_tpu import layouts as lay
from prisim_tpu import baselines as bl


@pytest.mark.parametrize("n,nside", [(7, 2), (19, 3), (37, 4), (331, 11)])
def test_hexagon_counts(n, nside):
    xy, labels = lay.hexagon_generator(14.6, n_total=n)
    assert xy.shape == (n, 2)
    assert len(labels) == n
    # centered at origin
    assert np.allclose(xy.mean(axis=0), 0.0, atol=1e-9)
    # nearest-neighbor spacing = 14.6 m
    d = np.linalg.norm(xy[:, None, :] - xy[None, :, :], axis=-1)
    d[d == 0] = np.inf
    assert np.min(d) == pytest.approx(14.6, rel=1e-9)


def test_hexagon_invalid_total():
    with pytest.raises(ValueError):
        lay.hexagon_generator(14.6, n_total=10)


def test_rectangle():
    xy, labels = lay.rectangle_generator([30.0, 4.0], [8, 8])
    assert xy.shape == (64, 2)
    xs = np.unique(np.round(xy[:, 0], 6))
    assert xs.size == 8
    assert np.allclose(np.diff(xs), 30.0)


def test_preset_layouts():
    hera19 = lay.preset_layout("HERA-19")
    assert hera19.nant == 19
    assert hera19.positions.shape == (19, 3)
    paper = lay.preset_layout("PAPER-64")
    assert paper.nant == 64
    with pytest.raises(ValueError):
        lay.preset_layout("NOPE-1")


def test_perturbed_seeded():
    a = lay.preset_layout("HERA-7").perturbed(0.1, 0.05, seed=42)
    b = lay.preset_layout("HERA-7").perturbed(0.1, 0.05, seed=42)
    assert np.array_equal(a.positions, b.positions)
    c = lay.preset_layout("HERA-7")
    rms = np.std(a.positions - c.positions)
    assert 0.01 < rms < 0.3


def test_baseline_generator():
    pos = np.array([[0., 0, 0], [10, 0, 0], [0, 20, 0]])
    vec, labels = bl.baseline_generator(pos, labels=["a", "b", "c"])
    assert vec.shape == (3, 3)
    assert np.allclose(sorted(np.linalg.norm(vec, axis=1)),
                       [10.0, 20.0, np.sqrt(500)])
    # labels are (j, i) with vec = pos[j]-pos[i]
    assert tuple(labels[0]) == ("b", "a")


def test_uniq_baselines_hera7():
    hera7 = lay.preset_layout("HERA-7")
    bset = bl.build_baselines(hera7, redundant=True)
    # HERA-7: 21 baselines total, 9 unique classes (hex geometry).
    assert bset.all_vectors.shape[0] == 21
    assert bset.nbl == 9
    assert bset.group_counts.sum() == 21
    # Redundancy expansion round-trips shapes.
    vis = np.arange(bset.nbl * 4).reshape(bset.nbl, 4).astype(complex)
    full = bset.expand_redundant(vis)
    assert full.shape == (21, 4)
    # every member of a group has its exemplar's value
    for u, members in bset.groups().items():
        for m in members:
            assert np.array_equal(full[m], vis[u])


def test_baseline_cuts():
    hera7 = lay.preset_layout("HERA-7")
    bset = bl.build_baselines(hera7, redundant=False, min_length=15.0)
    assert np.all(bset.lengths >= 15.0)
    bset2 = bl.build_baselines(hera7, redundant=False, max_length=15.0)
    assert np.all(bset2.lengths <= 15.0)
    assert bset.nbl + bset2.nbl == 21


def test_layout_file_parser(tmp_path):
    p = tmp_path / "layout.txt"
    p.write_text("# comment\nANT1 10.0 20.0 1.0\nANT2 -5.0 0.0 0.0\n")
    layout = lay.parse_layout_file(str(p))
    assert layout.nant == 2
    assert layout.labels[0] == "ANT1"
    assert np.allclose(layout.positions[1], [-5.0, 0.0, 0.0])
