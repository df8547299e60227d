"""Minimal pure-numpy FITS writer/reader (random groups + binary tables).

The environment has no astropy, so UVFITS export
(/root/reference/prisim/interferometry.py:9619-9689 writes via
pyuvdata/astropy) is implemented on top of this: 2880-byte header/data
blocks, big-endian data, random-groups primary HDUs and BINTABLE
extensions. Only what UVFITS needs — not a general FITS library."""

from __future__ import annotations

import numpy as np

__all__ = ["Card", "format_header", "write_random_groups",
           "write_bintable", "write_image", "read_fits"]

BLOCK = 2880


def _fmt_value(v):
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (int, np.integer)):
        return "%d" % v
    if isinstance(v, (float, np.floating)):
        s = "%.15G" % v
        if "." not in s and "E" not in s and "N" not in s:
            s += "."
        return s
    # string
    s = str(v).replace("'", "''")
    return "'%-8s'" % s


def card(key, value=None, comment=None):
    """One 80-char FITS header card."""
    key = key.upper()[:8]
    if value is None and comment is None:
        return "%-80s" % key
    if key in ("COMMENT", "HISTORY"):
        return "%-80s" % (key + " " + (str(value) if value else ""))
    vs = _fmt_value(value)
    if vs.startswith("'"):
        body = "%-8s= %-20s" % (key, vs)
    else:
        body = "%-8s= %20s" % (key, vs)
    if comment:
        body += " / " + comment
    return "%-80s" % body[:80]


def format_header(cards):
    """cards: list of 80-char strings (append END, pad to block)."""
    text = "".join(cards) + "%-80s" % "END"
    pad = (-len(text)) % BLOCK
    return (text + " " * pad).encode("ascii")


def _pad_data(buf):
    pad = (-len(buf)) % BLOCK
    return buf + b"\x00" * pad


def write_random_groups(fh, pars, data, header_cards):
    """Write a random-groups primary HDU.

    pars: (GCOUNT, PCOUNT) float32 group parameters;
    data: (GCOUNT, ...) float32 per-group data (NAXIS2.. reversed in
    header, caller supplies matching cards). Caller's header_cards must
    include SIMPLE/BITPIX/NAXIS*/GROUPS/PCOUNT/GCOUNT/PTYPE* etc.
    """
    fh.write(format_header(header_cards))
    pars = np.ascontiguousarray(pars, dtype=">f4")
    data = np.ascontiguousarray(data, dtype=">f4")
    gcount = pars.shape[0]
    body = bytearray()
    flat_data = data.reshape(gcount, -1)
    rec = np.empty((gcount, pars.shape[1] + flat_data.shape[1]),
                   dtype=">f4")
    rec[:, :pars.shape[1]] = pars
    rec[:, pars.shape[1]:] = flat_data
    body = rec.tobytes()
    fh.write(_pad_data(body))


_TFORM_DTYPE = {
    "A": ("S", 1), "E": (">f4", 4), "D": (">f8", 8),
    "J": (">i4", 4), "I": (">i2", 2), "K": (">i8", 8),
}


def write_bintable(fh, extname, columns, extra_cards=()):
    """Write a BINTABLE extension.

    columns: list of (name, tform, array) where tform like '8A', '3D',
    '1J', '1E'; array shape (nrows,) or (nrows, repeat)."""
    nrows = len(columns[0][2])
    row_bytes = 0
    for name, tform, arr in columns:
        rep = int(tform[:-1]) if tform[:-1] else 1
        row_bytes += rep * _TFORM_DTYPE[tform[-1]][1]
    cards = [
        card("XTENSION", "BINTABLE", "binary table extension"),
        card("BITPIX", 8), card("NAXIS", 2),
        card("NAXIS1", row_bytes), card("NAXIS2", nrows),
        card("PCOUNT", 0), card("GCOUNT", 1),
        card("TFIELDS", len(columns)),
    ]
    for i, (name, tform, arr) in enumerate(columns, 1):
        cards.append(card("TTYPE%d" % i, name))
        cards.append(card("TFORM%d" % i, tform))
    cards.append(card("EXTNAME", extname))
    cards.extend(extra_cards)
    fh.write(format_header(cards))

    buf = bytearray()
    for r in range(nrows):
        for name, tform, arr in columns:
            rep = int(tform[:-1]) if tform[:-1] else 1
            code = tform[-1]
            if code == "A":
                s = str(arr[r])[:rep].ljust(rep)
                buf += s.encode("ascii")
            else:
                dt = _TFORM_DTYPE[code][0]
                row = np.asarray(arr[r], dtype=dt).reshape(-1)
                if row.size != rep:
                    row = np.resize(row, rep)
                buf += row.tobytes()
    fh.write(_pad_data(bytes(buf)))


_BITPIX = {16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def write_image(fh, data=None, primary=False, extname=None,
                extra_cards=()):
    """Write an IMAGE HDU (primary or extension). data: ndarray or None
    (header-only HDU). Axis order follows FITS convention (NAXIS1 is the
    FASTEST-varying axis = the last numpy axis)."""
    cards = []
    if primary:
        cards.append(card("SIMPLE", True, "conforms to FITS standard"))
    else:
        cards.append(card("XTENSION", "IMAGE", "image extension"))
    if data is None:
        cards += [card("BITPIX", 8), card("NAXIS", 0)]
        if not primary:
            cards += [card("PCOUNT", 0), card("GCOUNT", 1)]
    else:
        data = np.asarray(data)
        if data.dtype.kind == "f":
            dt, bitpix = (">f8", -64) if data.itemsize == 8 else \
                (">f4", -32)
        else:
            dt, bitpix = ">i4", 32
        cards += [card("BITPIX", bitpix), card("NAXIS", data.ndim)]
        for i, n in enumerate(reversed(data.shape), 1):
            cards.append(card("NAXIS%d" % i, int(n)))
        if not primary:
            cards += [card("PCOUNT", 0), card("GCOUNT", 1)]
    if extname:
        cards.append(card("EXTNAME", extname))
    cards.extend(extra_cards)
    fh.write(format_header(cards))
    if data is not None:
        fh.write(_pad_data(np.ascontiguousarray(data, dtype=dt)
                           .tobytes()))


# -- reader (for round-trip tests) ------------------------------------------

def _parse_header(fh):
    cards = {}
    order = []
    while True:
        block = fh.read(BLOCK)
        if len(block) < BLOCK:
            return None
        text = block.decode("ascii", errors="replace")
        done = False
        for i in range(0, BLOCK, 80):
            c = text[i:i + 80]
            key = c[:8].strip()
            if key == "END":
                done = True
                break
            if "=" not in c[8:10]:
                continue
            raw = c[10:].split(" / ")[0].strip()
            if raw.startswith("'"):
                val = raw.strip("'").rstrip()
                # handle trailing quote
                val = raw[1:raw.rfind("'")].replace("''", "'").rstrip()
            elif raw == "T":
                val = True
            elif raw == "F":
                val = False
            else:
                try:
                    val = int(raw)
                except ValueError:
                    try:
                        val = float(raw)
                    except ValueError:
                        val = raw
            cards[key] = val
            order.append(key)
        if done:
            break
    return cards


def read_fits(path):
    """Parse a FITS file written by this module: returns a list of HDUs,
    each a dict with 'header' and 'data' (random-groups primary ->
    dict(pars, data); bintable -> dict of column arrays)."""
    hdus = []
    with open(path, "rb") as fh:
        while True:
            hdr = _parse_header(fh)
            if hdr is None:
                break
            if hdr.get("GROUPS") and hdr.get("GCOUNT", 0) >= 1:
                gcount = hdr["GCOUNT"]
                pcount = hdr["PCOUNT"]
                naxis = hdr["NAXIS"]
                dims = [hdr["NAXIS%d" % i] for i in range(2, naxis + 1)]
                per_group = int(np.prod(dims)) if dims else 0
                n = gcount * (pcount + per_group)
                raw = fh.read(((n * 4 + BLOCK - 1) // BLOCK) * BLOCK)
                arr = np.frombuffer(raw[:n * 4], dtype=">f4").reshape(
                    gcount, pcount + per_group)
                pars = arr[:, :pcount].astype(np.float64)
                data = arr[:, pcount:].reshape(
                    [gcount] + dims[::-1]).astype(np.float32)
                hdus.append(dict(header=hdr, pars=pars, data=data))
            elif hdr.get("XTENSION", "").strip() == "BINTABLE":
                nrows = hdr["NAXIS2"]
                row_bytes = hdr["NAXIS1"]
                raw = fh.read(
                    ((nrows * row_bytes + BLOCK - 1) // BLOCK) * BLOCK)
                cols = {}
                tfields = hdr["TFIELDS"]
                # build numpy structured dtype
                fields = []
                for i in range(1, tfields + 1):
                    tform = str(hdr["TFORM%d" % i]).strip()
                    name = str(hdr["TTYPE%d" % i]).strip()
                    rep = int(tform[:-1]) if tform[:-1] else 1
                    code = tform[-1]
                    base = _TFORM_DTYPE[code][0]
                    if code == "A":
                        fields.append((name, "S%d" % rep))
                    elif rep == 1:
                        fields.append((name, base))
                    else:
                        fields.append((name, base, (rep,)))
                dt = np.dtype(fields)
                table = np.frombuffer(raw[:nrows * row_bytes], dtype=dt)
                for name in dt.names:
                    cols[name] = table[name]
                hdus.append(dict(header=hdr, columns=cols))
            else:
                # plain image HDU (or empty primary)
                naxis = hdr.get("NAXIS", 0)
                out = dict(header=hdr)
                if naxis:
                    dims = [hdr.get("NAXIS%d" % i, 0)
                            for i in range(1, naxis + 1)]
                    bitpix = hdr.get("BITPIX", 8)
                    nbytes = abs(bitpix) // 8 * int(np.prod(dims))
                    raw = fh.read(((nbytes + BLOCK - 1) // BLOCK) * BLOCK)
                    dt = _BITPIX.get(bitpix)
                    if dt is not None and nbytes:
                        out["data"] = np.frombuffer(
                            raw[:nbytes], dtype=dt).reshape(dims[::-1])
                hdus.append(out)
    return hdus
