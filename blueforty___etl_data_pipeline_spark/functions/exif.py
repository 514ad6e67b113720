"""Pure-stdlib EXIF reader/writer — the image-metadata arm of the
multimodal ingest path.

EXIF (CIPA DC-008, public spec) is a TIFF structure embedded in a JPEG
``APP1`` segment: a byte-order mark (``II``/``MM``), IFD0 with
camera-level tags, an Exif sub-IFD (exposure, ISO, pixel dimensions)
and a GPS sub-IFD (latitude/longitude as degree/minute/second
RATIONALs).  A 100 TB image-corpus pipeline reads this long before any
pixel decode — for dedup keys (camera+timestamp), orientation-aware
transforms, and geo filtering — and it is pure integer container
parsing, so it carries an engine-exact oracle.

- :func:`build_exif_jpeg` — deterministic fixture builder: a genuine
  JPEG marker stream (SOI, a decoy APP0, the APP1 Exif payload with
  real IFD offsets in either byte order, EOI).
- :func:`parse_exif` — real path: scan JPEG markers honoring segment
  length fields, locate APP1/Exif, walk IFD0 → Exif IFD → GPS IFD
  with correct endianness, resolve out-of-line ASCII and RATIONAL
  values via their offset slots.

Subset: the tags below (the universal core).  Unknown tags are
skipped by offset arithmetic — exactly what a real reader does.
"""

from __future__ import annotations

import struct

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_EXPOSURE = 0x829A
TAG_ISO = 0x8827
TAG_PIXEL_X = 0xA002
TAG_PIXEL_Y = 0xA003
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _entry(endian, tag, typ, count, value_or_offset):
    return struct.pack(endian + "HHI", tag, typ, count) + value_or_offset


def _inline(endian, typ, values):
    """Pack small values into the 4-byte slot, right-padded."""
    if typ == 3:
        raw = b"".join(struct.pack(endian + "H", v) for v in values)
    elif typ == 4:
        raw = b"".join(struct.pack(endian + "I", v) for v in values)
    else:
        raise ValueError("inline type unsupported")
    return raw + bytes(4 - len(raw))


def build_exif_jpeg(
    make: str,
    orientation: int,
    iso: int,
    exposure: tuple[int, int],
    pixel_xy: tuple[int, int],
    datetime_s: str,
    gps_dms: tuple[int, int, int],
    big_endian: bool = False,
) -> bytes:
    """Assemble a real JPEG marker stream whose APP1 carries the given
    EXIF tags, with correct intra-TIFF offsets in either byte order."""
    e = ">" if big_endian else "<"
    bom = b"MM" if big_endian else b"II"

    make_b = make.encode("ascii") + b"\x00"
    dt_b = datetime_s.encode("ascii") + b"\x00"

    # Layout (offsets relative to the TIFF header):
    #   8: IFD0 (4 entries + next ptr), then Exif IFD, GPS IFD, data area
    n0 = 5
    ifd0_off = 8
    exif_off = ifd0_off + 2 + 12 * n0 + 4
    n1 = 4
    gps_off = exif_off + 2 + 12 * n1 + 4
    n2 = 2
    data_off = gps_off + 2 + 12 * n2 + 4

    data = bytearray()

    def put(raw: bytes) -> int:
        off = data_off + len(data)
        data.extend(raw)
        if len(raw) % 2:
            data.append(0)
        return off

    make_ptr = put(make_b)
    dt_ptr = put(dt_b)
    exp_ptr = put(struct.pack(e + "II", *exposure))
    d, m, s = gps_dms
    lat_ptr = put(
        struct.pack(e + "IIIIII", d, 1, m, 1, s, 1)
    )

    ifd0 = struct.pack(e + "H", n0)
    ifd0 += _entry(e, TAG_MAKE, 2, len(make_b),
                   struct.pack(e + "I", make_ptr))
    ifd0 += _entry(e, TAG_ORIENTATION, 3, 1, _inline(e, 3, [orientation]))
    ifd0 += _entry(e, TAG_DATETIME, 2, len(dt_b),
                   struct.pack(e + "I", dt_ptr))
    ifd0 += _entry(e, TAG_EXIF_IFD, 4, 1, _inline(e, 4, [exif_off]))
    ifd0 += _entry(e, TAG_GPS_IFD, 4, 1, _inline(e, 4, [gps_off]))
    ifd0 += struct.pack(e + "I", 0)

    exif = struct.pack(e + "H", n1)
    exif += _entry(e, TAG_EXPOSURE, 5, 1, struct.pack(e + "I", exp_ptr))
    exif += _entry(e, TAG_ISO, 3, 1, _inline(e, 3, [iso]))
    exif += _entry(e, TAG_PIXEL_X, 4, 1, _inline(e, 4, [pixel_xy[0]]))
    exif += _entry(e, TAG_PIXEL_Y, 4, 1, _inline(e, 4, [pixel_xy[1]]))
    exif += struct.pack(e + "I", 0)

    gps = struct.pack(e + "H", n2)
    gps += _entry(e, TAG_GPS_LAT_REF, 2, 2, b"N\x00\x00\x00")
    gps += _entry(e, TAG_GPS_LAT, 5, 3, struct.pack(e + "I", lat_ptr))
    gps += struct.pack(e + "I", 0)

    tiff = bom + struct.pack(e + "HI", 42, ifd0_off) + ifd0 + exif + gps
    tiff += bytes(data)

    app1 = b"Exif\x00\x00" + tiff
    out = b"\xff\xd8"  # SOI
    # decoy APP0/JFIF segment first — the scanner must skip it by length
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
    out += b"\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1
    out += b"\xff\xd9"  # EOI
    return out


def _walk_ifd(data: bytes, e: str, off: int) -> dict[int, tuple]:
    (n,) = struct.unpack_from(e + "H", data, off)
    tags: dict[int, tuple] = {}
    for i in range(n):
        ent = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(e + "HHI", data, ent)
        if typ not in _TYPE_SIZES:
            continue
        nbytes = _TYPE_SIZES[typ] * count
        if nbytes <= 4:
            voff = ent + 8
        else:
            (voff,) = struct.unpack_from(e + "I", data, ent + 8)
        if typ == 2:
            raw = data[voff : voff + count]
            tags[tag] = (raw.split(b"\x00")[0].decode("ascii", "replace"),)
        elif typ == 3:
            tags[tag] = struct.unpack_from(e + f"{count}H", data, voff)
        elif typ == 4:
            tags[tag] = struct.unpack_from(e + f"{count}I", data, voff)
        elif typ == 5:
            vals = struct.unpack_from(e + f"{2 * count}I", data, voff)
            tags[tag] = tuple(
                (vals[2 * k], vals[2 * k + 1]) for k in range(count)
            )
        else:  # BYTE
            tags[tag] = tuple(data[voff : voff + count])
    return tags


def parse_exif(jpeg: bytes) -> dict:
    """Scan JPEG markers for APP1/Exif and return the core tag dict."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    tiff = None
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"lost marker sync at {pos}")
        marker = jpeg[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        body = jpeg[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        pos += 2 + seglen
    if tiff is None:
        raise ValueError("no APP1/Exif segment")
    bom = tiff[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError("bad TIFF byte-order mark")
    magic, ifd0_off = struct.unpack_from(e + "HI", tiff, 2)
    if magic != 42:
        raise ValueError("bad TIFF magic")
    ifd0 = _walk_ifd(tiff, e, ifd0_off)
    out = {
        "make": ifd0.get(TAG_MAKE, ("",))[0],
        "orientation": ifd0.get(TAG_ORIENTATION, (0,))[0],
        "datetime": ifd0.get(TAG_DATETIME, ("",))[0],
        "big_endian": e == ">",
    }
    if TAG_EXIF_IFD in ifd0:
        sub = _walk_ifd(tiff, e, ifd0[TAG_EXIF_IFD][0])
        out["iso"] = sub.get(TAG_ISO, (0,))[0]
        out["exposure"] = sub.get(TAG_EXPOSURE, ((0, 1),))[0]
        out["pixel_x"] = sub.get(TAG_PIXEL_X, (0,))[0]
        out["pixel_y"] = sub.get(TAG_PIXEL_Y, (0,))[0]
    if TAG_GPS_IFD in ifd0:
        gps = _walk_ifd(tiff, e, ifd0[TAG_GPS_IFD][0])
        dms = gps.get(TAG_GPS_LAT, ())
        if len(dms) == 3:
            # exact arc-seconds (integer when the fixture's denominators
            # are 1; general rationals floor to whole seconds)
            out["lat_arcsec"] = (
                dms[0][0] * 3600 // dms[0][1]
                + dms[1][0] * 60 // dms[1][1]
                + dms[2][0] // dms[2][1]
            )
            out["lat_ref"] = gps.get(TAG_GPS_LAT_REF, ("",))[0]
    return out
