"""Clean-room UVFITS/UVH5 specification conformance tests.

The writers in prisim_tpu.io.{uvfits,uvh5} were previously validated
only by round-tripping through their own readers. No external reader
(astropy/pyuvdata/CASA) exists in this environment, so this module
validates the EMITTED BYTES directly against the published standards —
the FITS 4.0 standard (NASA FITS Standard, sections 3-7), the
random-groups convention (FITS std section 6), AIPS Memo 117 (UVFITS
conventions), and the UVH5 memo (pyuvdata docs/references/uvh5_memo) —
using only struct/numpy parsing written from the spec, sharing NO code
with prisim_tpu.io.fitsio (an io.fitsio bug cannot hide here).

What an external reader requires, checked here:
* 2880-byte blocking of every header and data unit
* 80-character ASCII cards; 8-char keywords; "= " value indicator;
  fixed-format values (FITS std 4.1.2, 4.2)
* mandatory keyword order SIMPLE, BITPIX, NAXIS, NAXIS1..n (std 4.4.1)
* random groups: NAXIS1=0, GROUPS=T, PCOUNT/GCOUNT (std section 6)
* big-endian IEEE-754 data (std 5.2-5.3)
* group parameters UU/VV/WW in seconds, two-part DATE, BASELINE in the
  2048 convention; data axes COMPLEX(3) x STOKES x FREQ x RA x DEC
  (AIPS Memo 117 section 2; pyuvdata reads exactly this layout)
* AIPS AN BINTABLE with TFORMn/TTYPEn column descriptors (std 7.3)
"""

import struct

import numpy as np
import pytest

from prisim_tpu import constants as CNST
from prisim_tpu.vis import VisibilitySet

BLOCK = 2880


# ---------------------------------------------------------------------------
# Independent FITS parsing (from the standard; no prisim_tpu.io imports)
# ---------------------------------------------------------------------------

def read_header_blocks(buf, off):
    """Read 2880-byte header blocks until the END card; returns
    (ordered list of (keyword, raw_card), dict of parsed values, next
    data offset). Validates card syntax per FITS std 4.1.2."""
    cards = []
    values = {}
    end_seen = False
    while not end_seen:
        block = buf[off:off + BLOCK]
        assert len(block) == BLOCK, "truncated header block"
        for i in range(0, BLOCK, 80):
            card = block[i:i + 80]
            assert len(card) == 80
            # FITS std 4.1.2: header chars restricted to ASCII 0x20-0x7E
            assert all(0x20 <= b <= 0x7E for b in card), \
                "non-ASCII-text byte in header card: %r" % card
            kw = card[:8].decode("ascii")
            cards.append((kw.rstrip(), card))
            if kw.rstrip() == "END":
                end_seen = True
                break
            if card[8:10] == b"= ":
                values[kw.rstrip()] = parse_value(card[10:].decode())
        off += BLOCK
    return cards, values, off


def parse_value(field):
    """Fixed/free-format FITS value parser (std 4.2)."""
    s = field.split("/")[0].strip()
    if s.startswith("'"):
        return s[1:s.rindex("'")].rstrip()
    if s == "T":
        return True
    if s == "F":
        return False
    try:
        return int(s)
    except ValueError:
        return float(s)


def keyword_order_ok(cards, expect_first):
    got = [kw for kw, _ in cards[:len(expect_first)]]
    return got == expect_first


def _data_size(values, grouped):
    naxes = [values["NAXIS%d" % i]
             for i in range(1, values["NAXIS"] + 1)]
    nbits = abs(values["BITPIX"])
    if grouped:
        per_group = np.prod([n for n in naxes[1:]]) if naxes[1:] else 1
        total = values["GCOUNT"] * (values["PCOUNT"] + per_group)
    else:
        total = np.prod(naxes) if naxes else 0
    return int(total) * (nbits // 8)


# ---------------------------------------------------------------------------
# Fixture: a small simulated VisibilitySet with known values
# ---------------------------------------------------------------------------

@pytest.fixture()
def small_vs():
    rng = np.random.RandomState(7)
    nant, nchan, nacc = 4, 8, 3
    pos = np.zeros((nant, 3))
    pos[:, 0] = np.arange(nant) * 14.6
    labels_ant = np.asarray([str(i) for i in range(nant)])
    from prisim_tpu.baselines import baseline_generator
    vecs, pairs = baseline_generator(pos, labels=labels_ant)
    nbl = vecs.shape[0]
    freqs = 150e6 + 1e5 * np.arange(nchan)
    vis = (rng.randn(nbl, nchan, nacc)
           + 1j * rng.randn(nbl, nchan, nacc)).astype(np.complex64)
    return VisibilitySet(
        baselines=vecs, labels=pairs, freqs=freqs,
        lst=10.0 + 0.25 * np.arange(nacc),
        skyvis=vis, timestamps=2458000.5 + np.arange(nacc) * 60 / 86400.0,
        t_acc=np.full(nacc, 60.0), latitude=-30.72, longitude=21.43,
        telescope={"id": "hera"},
        layout=dict(positions=pos, labels=labels_ant,
                    ids=np.arange(nant), coords="ENU"))


def test_uvfits_bytes_conform_to_standard(small_vs, tmp_path):
    from prisim_tpu.io.uvfits import save_uvfits, antnums_to_blnum
    path = str(tmp_path / "spec.uvfits")
    save_uvfits(small_vs, path)
    buf = open(path, "rb").read()

    # FITS std 3.1: the file is a sequence of 2880-byte blocks
    assert len(buf) % BLOCK == 0

    cards, hdr, data_off = read_header_blocks(buf, 0)
    # std 4.4.1.1 mandatory ordering for a random-groups primary HDU
    assert keyword_order_ok(cards, ["SIMPLE", "BITPIX", "NAXIS"] +
                            ["NAXIS%d" % i
                             for i in range(1, hdr["NAXIS"] + 1)])
    assert hdr["SIMPLE"] is True
    assert hdr["BITPIX"] == -32
    # random-groups signature (std section 6): NAXIS1 = 0, GROUPS = T
    assert hdr["NAXIS1"] == 0
    assert hdr["GROUPS"] is True
    nblts = small_vs.nbl * small_vs.n_acc
    assert hdr["GCOUNT"] == nblts
    assert hdr["PCOUNT"] == 6

    # AIPS memo 117: random parameters UU, VV, WW, DATE, DATE, BASELINE
    ptypes = [hdr["PTYPE%d" % i] for i in range(1, 7)]
    assert ptypes == ["UU", "VV", "WW", "DATE", "DATE", "BASELINE"]
    # regular axes: COMPLEX(3), STOKES, FREQ, RA, DEC (memo 117 sec 2)
    assert hdr["NAXIS2"] == 3 and hdr["CTYPE2"] == "COMPLEX"
    assert hdr["CTYPE3"] == "STOKES" and hdr["CRVAL3"] == -5.0  # XX
    assert hdr["CTYPE4"] == "FREQ"
    assert hdr["NAXIS4"] == small_vs.nchan

    # data: big-endian f32 groups of PCOUNT pars + the data cube
    nchan = small_vs.nchan
    per_group = 6 + 3 * nchan
    raw = np.frombuffer(buf, dtype=">f4", count=nblts * per_group,
                        offset=data_off).reshape(nblts, per_group)
    pars = raw[:, :6].astype(np.float64)
    cube = raw[:, 6:].reshape(nblts, nchan, 3)

    # decode group parameters with PSCAL/PZERO (std 6.2)
    dec = {}
    for i, name in enumerate(ptypes):
        v = pars[:, i] * hdr["PSCAL%d" % (i + 1)] \
            + hdr["PZERO%d" % (i + 1)]
        dec.setdefault(name, []).append(v)

    # BASELINE: 2048 convention, time-major blt ordering
    from prisim_tpu.io.uvfits import blnum_to_antnums
    a1, a2 = blnum_to_antnums(dec["BASELINE"][0].astype(np.int64))
    lab = np.asarray(small_vs.labels, dtype=str)
    exp_a2 = np.tile(lab[:, 0].astype(int), small_vs.n_acc)
    exp_a1 = np.tile(lab[:, 1].astype(int), small_vs.n_acc)
    np.testing.assert_array_equal(a1, exp_a1)
    np.testing.assert_array_equal(a2, exp_a2)

    # DATE: two-part JD reconstructs the timestamps to < 1 ms
    jd = dec["DATE"][0] + dec["DATE"][1]
    exp_jd = np.repeat(np.asarray(small_vs.timestamps), small_vs.nbl)
    np.testing.assert_allclose(jd, exp_jd, atol=1e-8)

    # UU/VV/WW are in SECONDS (memo 117): first time's w == uvw/c
    from prisim_tpu.vis import project_baselines
    pvs = project_baselines(small_vs)
    uvw_m = np.transpose(np.asarray(pvs.projected_baselines),
                         (2, 0, 1)).reshape(nblts, 3)
    np.testing.assert_allclose(
        np.stack([dec["UU"][0], dec["VV"][0], dec["WW"][0]], -1),
        uvw_m / CNST.c, rtol=2e-7, atol=1e-12)

    # visibilities: conjugated, time-major, re/im/wt triplets
    expect = np.transpose(np.conj(np.asarray(small_vs.skyvis)),
                          (2, 0, 1)).reshape(nblts, nchan)
    np.testing.assert_allclose(cube[..., 0], expect.real, rtol=1e-6)
    np.testing.assert_allclose(cube[..., 1], expect.imag, rtol=1e-6)
    assert np.all(cube[..., 2] > 0)          # unflagged weights

    # ---- AIPS AN binary table extension (std 7.3) ----
    dsize = _data_size(hdr, grouped=True)
    ext_off = data_off + (-(-dsize // BLOCK)) * BLOCK
    ecards, ehdr, edata_off = read_header_blocks(buf, ext_off)
    assert keyword_order_ok(ecards, ["XTENSION", "BITPIX", "NAXIS",
                                     "NAXIS1", "NAXIS2", "PCOUNT",
                                     "GCOUNT", "TFIELDS"])
    assert ehdr["XTENSION"].startswith("BINTABLE")
    assert ehdr["BITPIX"] == 8
    assert ehdr["EXTNAME"].startswith("AIPS AN")
    assert ehdr["NAXIS2"] == 4               # one row per antenna
    ttypes = [ehdr["TTYPE%d" % i]
              for i in range(1, ehdr["TFIELDS"] + 1)]
    assert ttypes[:3] == ["ANNAME", "STABXYZ", "NOSTA"]

    # decode row 0 by walking TFORM byte widths (std table 18)
    widths = {"A": 1, "D": 8, "J": 4, "E": 4}
    row = buf[edata_off:edata_off + ehdr["NAXIS1"]]
    pos = 0
    vals = {}
    for i in range(1, ehdr["TFIELDS"] + 1):
        tform = ehdr["TFORM%d" % i]
        rep = int(tform[:-1]) if tform[:-1] else 1
        code = tform[-1]
        nbytes = rep * widths[code]
        fieldbuf = row[pos:pos + nbytes]
        if code == "A":
            vals[ttypes[i - 1]] = fieldbuf.decode("ascii").rstrip()
        elif code == "D":
            vals[ttypes[i - 1]] = np.frombuffer(fieldbuf, ">f8")
        elif code == "J":
            vals[ttypes[i - 1]] = struct.unpack(">%di" % rep, fieldbuf)
        else:
            vals[ttypes[i - 1]] = np.frombuffer(fieldbuf, ">f4")
        pos += nbytes
    assert pos == ehdr["NAXIS1"]
    assert vals["ANNAME"] == "0"
    assert vals["NOSTA"][0] == 1
    # STABXYZ is ECEF relative to the array center: antenna 0 sits at
    # ENU (0,0,0) => relative ECEF ~ 0
    np.testing.assert_allclose(vals["STABXYZ"], 0.0, atol=1e-6)


def test_uvh5_layout_conforms_to_memo(small_vs, tmp_path):
    """UVH5 memo conformance: required /Header and /Data members, their
    dtypes and unit conventions, parsed with plain h5py (no
    prisim_tpu.io reader)."""
    import h5py
    from prisim_tpu.io.uvh5 import save_uvh5
    path = str(tmp_path / "spec.uvh5")
    save_uvh5(small_vs, path)
    with h5py.File(path, "r") as f:
        hdr = f["Header"]
        dat = f["Data"]
        nblts = small_vs.nbl * small_vs.n_acc
        # required scalar metadata
        for key in ("latitude", "longitude", "altitude", "Nants_data",
                    "Nants_telescope", "Nbls", "Nblts", "Nfreqs",
                    "Npols", "Ntimes", "Nspws"):
            assert key in hdr, "UVH5 required header %r missing" % key
        assert hdr["Nblts"][()] == nblts
        assert hdr["Nfreqs"][()] == small_vs.nchan
        # latitude/longitude in DEGREES (uvh5 memo section 3.1)
        assert abs(hdr["latitude"][()] - small_vs.latitude) < 1e-10
        # uvw_array in METERS (not seconds)
        uvw = hdr["uvw_array"][()]
        assert uvw.shape == (nblts, 3)
        assert np.abs(uvw).max() > 1.0       # meters scale, not seconds
        # ant arrays 0-indexed ints of length Nblts
        assert hdr["ant_1_array"].shape == (nblts,)
        assert hdr["ant_1_array"].dtype.kind == "i"
        # time_array is JD
        assert np.all(hdr["time_array"][()] > 2.4e6)
        # data shapes: (Nblts, Nfreqs, Npols), complex visdata, bool
        # flags, float nsamples
        npols = int(hdr["Npols"][()])
        assert dat["visdata"].shape == (nblts, small_vs.nchan, npols)
        assert dat["visdata"].dtype.kind == "c"
        assert dat["flags"].shape == (nblts, small_vs.nchan, npols)
        assert dat["flags"].dtype == np.bool_
        assert dat["nsamples"].shape == (nblts, small_vs.nchan, npols)
        assert dat["nsamples"].dtype.kind == "f"
        # polarization_array: XX = -5 (AIPS convention)
        np.testing.assert_array_equal(hdr["polarization_array"][()],
                                      [-5])
