"""Multimodal plumbing: binary payloads + Arrow-batched decode stub."""

from __future__ import annotations

import pytest

from clickestream_project_bigdata_spark.operators import multimodal


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, "abc"), (2, "hello world"), (3, "x" * 200)],
        "doc_id long, text string",
    )


def test_attach_binary_schema(docs):
    out = multimodal.attach_binary(docs)
    assert out.schema["payload"].dataType.simpleString() == "binary"
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].meta.n_bytes == 3 and r[3].meta.n_bytes == 200


def test_decode_stub_deterministic(docs):
    out = multimodal.decode_images(multimodal.attach_binary(docs))
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].n_bytes == 3
    assert r[1].width == 64 + 3 % 577 and r[1].height == 64 + (3 * 31) % 417
    assert r[1].channels == 3
    # schema is the declared one
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_bytes", "width", "height", "channels"]


def test_decode_real_unknown_format_yields_null_stats(docs):
    """real=True on non-image payloads (the fixture's text bytes) keeps the
    rows with format='unknown' and NULL pixel stats — triage must not die."""
    out = multimodal.decode_images(multimodal.attach_binary(docs), real=True)
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].format == "unknown"
    assert r[1].width is None and r[1].pixel_mean is None
    assert r[1].n_bytes == 3


# ---------------------------------------------------------------------------
# real=True stdlib decoder, pinned against INDEPENDENTLY encoded images
# ---------------------------------------------------------------------------

def _encode_png(pixels, color_type, filters=None, palette=None):
    """Minimal independent PNG encoder (forward filtering per spec §4.5.2)
    so the decoder under test is checked against the format, not itself."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    ch = 1 if px.ndim == 2 else px.shape[2]
    flat = px.reshape(h, w * ch).astype(np.intc)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.intc)
    for y in range(h):
        cur, ft = flat[y], filters[y]
        if ft == 0:
            out = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(ch, np.intc), cur[:-ch]])
            out = (cur - left) & 0xFF
        elif ft == 2:
            out = (cur - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate([np.zeros(ch, np.intc), cur[:-ch]])
            out = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            left = np.concatenate([np.zeros(ch, np.intc), cur[:-ch]])
            upleft = np.concatenate([np.zeros(ch, np.intc), prev[:-ch]])
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            out = (cur - pred) & 0xFF
        raw.append(ft)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if palette is not None:
        parts.append(chunk(b"PLTE", bytes(palette)))
    parts.append(chunk(b"IDAT", zlib.compress(bytes(raw))))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)


def _encode_bmp(pixels, top_down=False):
    """Minimal independent 24-bit BI_RGB BMP encoder (BGR rows, 4-byte
    aligned, bottom-up unless top_down)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    bgr = px[:, :, [2, 1, 0]]
    rows = bgr if top_down else bgr[::-1]
    pad = (-(w * 3)) % 4
    body = b"".join(r.tobytes() + b"\x00" * pad for r in rows)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return hdr + dib + body


def test_decode_real_png_all_filters_roundtrip(spark):
    """8-bit RGB PNG whose rows cycle ALL FIVE filter types decodes to the
    exact source pixels' stats; gray and RGBA variants too."""
    import numpy as np

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (10, 9, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (5, 12), dtype=np.uint8)
    rgba = rng.integers(0, 256, (6, 4, 4), dtype=np.uint8)
    rows = [
        (1, _encode_png(rgb, 2, filters=[y % 5 for y in range(10)])),
        (2, _encode_png(gray, 0, filters=[4, 3, 2, 1, 0])),
        (3, _encode_png(rgba, 6, filters=[1, 4, 1, 4, 3, 2])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in multimodal.decode_images(df, real=True).collect()}
    for i, (arr, ch) in enumerate([(rgb, 3), (gray, 1), (rgba, 4)], start=1):
        r = got[i]
        assert r.format == "png" and r.channels == ch
        assert (r.width, r.height) == (arr.shape[1], arr.shape[0])
        assert r.pixel_min == int(arr.min()) and r.pixel_max == int(arr.max())
        assert abs(r.pixel_mean - float(arr.mean())) < 1e-9


def test_decode_real_png_palette(spark):
    """Color-type-3 PNG expands through PLTE: stats are over the LOOKED-UP
    RGB values, not the indices."""
    import numpy as np

    idx = np.array([[0, 1], [2, 1]], dtype=np.uint8)
    palette = [10, 20, 30, 200, 150, 100, 0, 0, 255]
    png = _encode_png(idx, 3, palette=palette)
    df = spark.createDataFrame([(1, png)], "doc_id long, payload binary")
    r = multimodal.decode_images(df, real=True).collect()[0]
    looked_up = np.array(palette, dtype=np.uint8).reshape(3, 3)[idx]
    assert r.format == "png" and r.channels == 3
    assert r.pixel_min == int(looked_up.min())
    assert r.pixel_max == int(looked_up.max())
    assert abs(r.pixel_mean - float(looked_up.mean())) < 1e-9


def test_decode_real_bmp_both_row_orders(spark):
    """24-bit BMP decodes to exact stats in both bottom-up (positive
    height) and top-down (negative height) row order, with row padding."""
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)  # w*3=15 -> 1 pad byte
    df = spark.createDataFrame(
        [(1, _encode_bmp(img)), (2, _encode_bmp(img, top_down=True))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in multimodal.decode_images(df, real=True).collect()}
    for i in (1, 2):
        r = got[i]
        assert r.format == "bmp" and (r.width, r.height, r.channels) == (5, 7, 3)
        assert r.pixel_min == int(img.min()) and r.pixel_max == int(img.max())
        assert abs(r.pixel_mean - float(img.mean())) < 1e-9


def test_decode_real_jpeg_and_truncated_yield_nulls(spark):
    """Corrupt JPEG (garbage APP0 length) and truncated PNG payloads keep
    their rows with NULL stats and the sniffed format."""
    good = _encode_png([[0, 255]], 0)
    df = spark.createDataFrame(
        [
            (1, b"\xff\xd8\xff\xe0junk"),
            (2, good[:20]),  # truncated PNG
            (3, good),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in multimodal.decode_images(df, real=True).collect()}
    assert got[1].format == "jpeg" and got[1].pixel_mean is None
    assert got[2].format == "png" and got[2].pixel_mean is None
    assert got[3].pixel_min == 0 and got[3].pixel_max == 255


def test_resize_meta(docs):
    decoded = multimodal.decode_images(multimodal.attach_binary(docs))
    out = {r.doc_id: r for r in multimodal.resize_meta(decoded).collect()}
    assert out[1].target_w == 224
    assert out[1].scale_x == round((64 + 3 % 577) / 224, 6)


def test_extract_features_unit_norm_and_determinism(docs):
    out = multimodal.extract_features(multimodal.attach_binary(docs))
    r = {x.doc_id: x.feature for x in out.collect()}
    assert len(r[1]) == multimodal.FEATURE_DIM
    assert abs(sum(v * v for v in r[2]) - 1.0) < 1e-5  # unit norm
    # deterministic: same payload → same feature
    again = {x.doc_id: x.feature for x in
             multimodal.extract_features(multimodal.attach_binary(docs)).collect()}
    assert r == again


def test_features_feed_similarity_operators(spark, docs):
    from clickestream_project_bigdata_spark.operators import similarity

    feats = multimodal.extract_features(multimodal.attach_binary(docs))
    top = similarity.brute_force_topk(
        feats, query_id=1, k=2, id_col="doc_id", vec_col="feature"
    ).collect()
    assert top[0]["doc_id"] == 1 and top[0]["score"] == 1.0


def test_sample_frames(docs):
    out = multimodal.sample_frames(multimodal.attach_binary(docs), every_nth=10)
    rows = {(r.doc_id, r.frame_idx) for r in out.collect()}
    # doc 1: n_bytes=3 -> n_frames=4 -> indices 0 only (0..3 step 10)
    assert (1, 0) in rows and (1, 10) not in rows
    # doc 3: n_bytes=200 -> n_frames=1 -> index 0
    assert (3, 0) in rows
    # doc 2: n_bytes=11 -> n_frames=12 -> 0, 10
    assert (2, 10) in rows


def test_image_header_dimensions_real_formats(spark):
    """Genuine container bytes: a valid 3x2 PNG (built with zlib), a GIF
    logical screen, a BMP DIB header, a JPEG magic (detected, NULL dims),
    and garbage -> unknown. All parsed JVM-side from fixed offsets."""
    import struct
    import zlib

    from clickestream_project_bigdata_spark.operators.multimodal import (
        image_header_dimensions,
    )

    def png_bytes(w, h):
        def chunk(typ, data):
            c = typ + data
            return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    gif = b"GIF89a" + struct.pack("<HH", 640, 480) + b"\x00" * 10
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 1920, 1080) + b"\x00" * 10
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 16
    rows = [(1, png_bytes(3, 2)), (2, gif), (3, bmp), (4, jpeg), (5, b"not an image")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.format, r.width, r.height)
           for r in image_header_dimensions(df).collect()}
    assert got[1] == ("png", 3, 2)
    assert got[2] == ("gif", 640, 480)
    assert got[3] == ("bmp", 1920, 1080)
    assert got[4] == ("jpeg", None, None)
    assert got[5] == ("unknown", None, None)


def test_jpeg_dimensions_sof_scan(spark):
    """A real minimal JPEG structure (APP0 + DQT + SOF0) yields exact
    dims via the segment walk; progressive SOF2 also; garbage -> NULL."""
    import struct

    from clickestream_project_bigdata_spark.operators.multimodal import (
        jpeg_dimensions,
    )

    def jpeg_bytes(w, h, sof=0xC0):
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
        sof0 = bytes([0xFF, sof]) + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x11\x00"
        return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"

    rows = [
        (1, jpeg_bytes(800, 600)),
        (2, jpeg_bytes(31, 17, sof=0xC2)),  # progressive
        (3, b"\xff\xd8\xff\xd9"),           # no SOF
        (4, b"PNG-ish garbage"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.width, r.height) for r in jpeg_dimensions(df).collect()}
    assert got[1] == (800, 600)
    assert got[2] == (31, 17)
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def _encode_gif(pixels, palette):
    """Independent in-test GIF encoder: literal-code LZW (a CLEAR before
    every pixel keeps the code width fixed — the classic 'uncompressed
    GIF' technique), LSB-first bit packing, 255-byte sub-blocks. Valid
    input for ANY conforming decoder, written without referencing the
    decoder under test."""
    h = len(pixels)
    w = len(pixels[0])
    n_colors = len(palette)
    min_code = max(2, (n_colors - 1).bit_length())
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    bits = []

    def emit(code):
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    for row in pixels:
        for px in row:
            emit(px)
            emit(clear)  # reset so the decoder's table never grows
    emit(end)
    data = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, b in enumerate(bits[i : i + 8]):
            byte |= b << j
        data.append(byte)
    # smallest GCT size exponent covering the palette (table = 2^(exp+1))
    exp = max(0, (max(2, n_colors) - 1).bit_length() - 1)
    table_n = 2 ** (exp + 1)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | exp)  # GCT present, size exponent
    out += b"\x00\x00"  # bg color, aspect
    for i in range(table_n):
        out += bytes(palette[i]) if i < n_colors else b"\x00\x00\x00"
    out.append(0x2C)  # image descriptor
    out += (0).to_bytes(2, "little") * 2
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0)  # no LCT, not interlaced
    out.append(min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def test_decode_real_gif_lzw_roundtrip(spark):
    """GIF path of decode_images(real=True): a 3x2 four-color image built
    by an independent in-test encoder decodes to exact pixel stats; a
    truncated GIF yields NULL stats without killing the batch."""
    from clickestream_project_bigdata_spark.operators.multimodal import decode_images

    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    pixels = [[0, 1, 2], [3, 0, 1]]
    payload = _encode_gif(pixels, palette)
    flat = [palette[p] for row in pixels for p in row]
    vals = [c for px in flat for c in px]
    expect_mean = sum(vals) / len(vals)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(payload[:20]))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_images(df, real=True).collect()}
    g = got[1]
    assert (g.format, g.width, g.height, g.channels) == ("gif", 3, 2, 3)
    assert abs(g.pixel_mean - expect_mean) < 1e-9
    assert (g.pixel_min, g.pixel_max) == (0, 255)
    t = got[2]
    assert t.format == "gif" and t.width is None and t.pixel_mean is None


def _encode_jpeg(planes, q=1, dri=0):
    """Independent in-test BASELINE JPEG encoder: grayscale (1 plane) or
    YCbCr 4:4:4 (3 planes, already converted), quant table ``q`` (a flat
    scalar or a full 64-entry NATURAL-order table — written to the DQT
    segment in ZIGZAG order per ITU T.81 B.2.4.1), optional ``dri``
    restart interval (DRI segment + RSTn markers every ``dri`` MCUs),
    custom canonical Huffman tables embedded via DHT (DC: 12 symbols at
    4 bits; AC: the full 162-symbol set at 8 bits — valid, just
    uncompressed-ish), MSB-first bit packing with 0xFF byte stuffing.
    Written from the spec, not from the decoder under test."""
    import math

    import numpy as np

    h, w = planes[0].shape
    nf = len(planes)
    qtab = (
        np.full(64, int(q), dtype=np.int64)
        if np.isscalar(q)
        else np.asarray(q, dtype=np.int64).reshape(64)
    )
    basis = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            basis[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    zig = []
    for d in range(15):
        rng = range(d + 1) if d < 8 else range(d - 7, 8)
        idx = [(d - j, j) for j in rng]
        if d % 2 == 1:
            idx.reverse()
        zig.extend(r * 8 + c for r, c in idx)

    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_syms = sorted(set(ac_syms))
    dc_codes = {sym: (4, i) for i, sym in enumerate(dc_syms)}
    ac_codes = {sym: (8, i) for i, sym in enumerate(ac_syms)}

    bits = []
    data = bytearray()

    def put(nbits, val):
        for i in range(nbits - 1, -1, -1):
            bits.append((val >> i) & 1)

    def flush_align():
        # pad to a byte boundary with 1s per spec, pack MSB-first with
        # 0xFF stuffing, append to the entropy data, clear the bit buffer
        while len(bits) % 8:
            bits.append(1)
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            data.append(byte)
            if byte == 0xFF:
                data.append(0x00)
        bits.clear()

    preds = [0] * nf
    bw, bh = (w + 7) // 8, (h + 7) // 8
    mcu_index = 0
    rst_n = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and mcu_index and mcu_index % dri == 0:
                flush_align()
                data.extend([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                preds = [0] * nf
            mcu_index += 1
            for ci in range(nf):
                blk = np.zeros((8, 8))
                tile = planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                blk[: tile.shape[0], : tile.shape[1]] = tile
                coef = basis @ (blk - 128.0) @ basis.T
                qc = np.round(coef.reshape(64) / qtab).astype(int)
                zzc = [int(qc[zig[k]]) for k in range(64)]
                diff = zzc[0] - preds[ci]
                preds[ci] = zzc[0]
                size = abs(diff).bit_length()
                l, c = dc_codes[size]
                put(l, c)
                if size:
                    vv = diff if diff >= 0 else diff + (1 << size) - 1
                    put(size, vv)
                k, run = 1, 0
                while k < 64:
                    v = zzc[k]
                    if v == 0:
                        run += 1
                    else:
                        while run >= 16:
                            l, c = ac_codes[0xF0]
                            put(l, c)
                            run -= 16
                        size = abs(v).bit_length()
                        l, c = ac_codes[(run << 4) | size]
                        put(l, c)
                        vv = v if v >= 0 else v + (1 << size) - 1
                        put(size, vv)
                        run = 0
                    k += 1
                if run:
                    l, c = ac_codes[0x00]
                    put(l, c)
    flush_align()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    # DQT carries the table in zigzag scan order
    out += seg(0xDB, bytes([0]) + bytes(int(qtab[zig[k]]) for k in range(64)))
    if dri:
        out += seg(0xDD, dri.to_bytes(2, "big"))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nf])
    for c in range(nf):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC0, sof)
    dc_counts = [0] * 16
    dc_counts[3] = len(dc_syms)  # length 4 -> index 3
    out += seg(0xC4, bytes([0x00] + dc_counts + dc_syms))
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)  # length 8
    out += seg(0xC4, bytes([0x10] + ac_counts + ac_syms))
    sos = bytes([nf])
    for c in range(nf):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += data
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_real_jpeg_baseline_gray(spark):
    """Baseline grayscale JPEG from the independent in-test encoder:
    two flat blocks (exercises DC prediction) decode to exact values at
    q=1; a horizontally-varying image decodes with increasing column
    means (zigzag orientation pin); truncated payloads yield NULL."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import decode_images

    flat = np.zeros((8, 16))
    flat[:, :8] = 96.0
    flat[:, 8:] = 160.0
    grad = np.tile(np.linspace(40, 216, 16), (8, 1))
    p_flat = _encode_jpeg([flat])
    p_grad = _encode_jpeg([grad])
    df = spark.createDataFrame(
        [
            (1, bytearray(p_flat)),
            (2, bytearray(p_grad)),
            (3, bytearray(p_flat[:40])),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_images(df, real=True).collect()}
    f = got[1]
    assert (f.format, f.width, f.height, f.channels) == ("jpeg", 16, 8, 1)
    assert abs(f.pixel_mean - 128.0) < 0.75
    assert f.pixel_min >= 94 and f.pixel_max <= 162
    g = got[2]
    assert g.width == 16 and abs(g.pixel_mean - grad.mean()) < 1.5
    t = got[3]
    assert t.format == "jpeg" and t.width is None


def _jpeg_reference_stats(planes, qtab_nat):
    """Independent reference decode of what _encode_jpeg produces: forward
    DCT -> quantize -> dequantize -> exact IDCT -> +128 -> clip/round.
    Mirrors the spec math, not the decoder's code."""
    import math

    import numpy as np

    basis = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            basis[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    qtab = np.asarray(qtab_nat, dtype=np.float64).reshape(8, 8)
    outs = []
    for plane in planes:
        h, w = plane.shape
        bw, bh = (w + 7) // 8, (h + 7) // 8
        full = np.zeros((bh * 8, bw * 8))
        for by in range(bh):
            for bx in range(bw):
                blk = np.zeros((8, 8))
                tile = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                blk[: tile.shape[0], : tile.shape[1]] = tile
                coef = basis @ (blk - 128.0) @ basis.T
                deq = np.round(coef / qtab) * qtab
                full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    basis.T @ deq @ basis + 128.0
                )
        outs.append(np.clip(full[:h, :w], 0, 255).round())
    px = np.stack(outs, axis=-1)
    return float(px.mean()), int(px.min()), int(px.max())


# Standard quantization table from ITU T.81 Annex K.1 (luminance),
# natural (row-major) order — strongly non-flat, so a decoder that applies
# the zigzag-serialized DQT without de-zigzagging produces wrong pixels.
_ANNEX_K_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


def test_decode_real_jpeg_nonflat_quant_table(spark):
    """Advisor r7 (high): DQT tables are zigzag-serialized; the decoder
    must de-zigzag before dequantizing. A flat table cannot see the bug —
    this pins exact decoded stats for the Annex K luminance table against
    an independent spec-math reference."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import decode_images

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 24)).astype(np.float64)
    payload = _encode_jpeg([img], q=_ANNEX_K_LUMA)
    exp_mean, exp_min, exp_max = _jpeg_reference_stats([img], _ANNEX_K_LUMA)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    [row] = decode_images(df, real=True).collect()
    assert (row.format, row.width, row.height, row.channels) == ("jpeg", 24, 16, 1)
    assert abs(row.pixel_mean - exp_mean) < 1e-9
    assert (row.pixel_min, row.pixel_max) == (exp_min, exp_max)


def test_decode_real_jpeg_restart_markers(spark):
    """DRI + RSTn handling: a 4-MCU image with restart interval 2 decodes
    to the identical pixels as the marker-free encoding (predictors reset
    on both sides); tampering with one RSTn number (out-of-sequence
    restart) yields NULL stats instead of silently corrupted pixels."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import decode_images

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 32)).astype(np.float64)
    p_rst = _encode_jpeg([img], q=_ANNEX_K_LUMA, dri=2)
    exp_mean, exp_min, exp_max = _jpeg_reference_stats([img], _ANNEX_K_LUMA)
    assert b"\xff\xd0" in p_rst  # the encoder really emitted RST0
    # tamper: RST0 -> RST3 breaks the modulo-8 sequence
    p_bad = p_rst.replace(b"\xff\xd0", b"\xff\xd3", 1)
    df = spark.createDataFrame(
        [(1, bytearray(p_rst)), (2, bytearray(p_bad))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_images(df, real=True).collect()}
    ok = got[1]
    assert (ok.width, ok.height) == (32, 8)
    assert abs(ok.pixel_mean - exp_mean) < 1e-9
    assert (ok.pixel_min, ok.pixel_max) == (exp_min, exp_max)
    bad = got[2]
    assert bad.format == "jpeg" and bad.pixel_mean is None


def test_decode_real_jpeg_color_444(spark):
    """3-component 4:4:4 JPEG: a pure-red image survives the YCbCr
    round trip (encoder converts RGB->YCbCr; decoder converts back)."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import decode_images

    h, w = 8, 8
    r_ch = np.full((h, w), 200.0)
    g_ch = np.full((h, w), 30.0)
    b_ch = np.full((h, w), 60.0)
    y = 0.299 * r_ch + 0.587 * g_ch + 0.114 * b_ch
    cb = -0.168736 * r_ch - 0.331264 * g_ch + 0.5 * b_ch + 128.0
    cr = 0.5 * r_ch - 0.418688 * g_ch - 0.081312 * b_ch + 128.0
    payload = _encode_jpeg([y, cb, cr])
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    [row] = decode_images(df, real=True).collect()
    assert (row.format, row.width, row.height, row.channels) == ("jpeg", 8, 8, 3)
    expect = (200.0 + 30.0 + 60.0) / 3
    assert abs(row.pixel_mean - expect) < 2.0
    assert row.pixel_max <= 203 and row.pixel_min >= 27


def test_extract_features_real_pixel_derived(spark):
    """VERDICT r7 #4: real=True features are deterministic functions of
    DECODED pixels — pinned elementwise against an independent in-test
    computation of the documented layout ((dim-8)-bin luma histogram + 8
    stats, L2-normalized) on a known 24-bit BMP; a grayscale PNG exercises
    the replicated-luma path; corrupt payloads yield a NULL feature row."""
    import math

    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import (
        extract_features,
    )

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(6, 9, 3)).astype(np.uint8)
    p_bmp = _encode_bmp(rgb)
    gray = rng.integers(0, 256, size=(5, 7)).astype(np.uint8)
    p_png = _encode_png(gray[:, :, None], color_type=0)
    df = spark.createDataFrame(
        [
            (1, bytearray(p_bmp)),
            (2, bytearray(p_png)),
            (3, bytearray(b"\x89PNG\r\n\x1a\njunk")),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in extract_features(df, real=True, dim=16).collect()}

    def expected(px, w, h, dim=16):
        a = px.astype(np.float64)
        if a.shape[2] >= 3:
            r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        else:
            r = g = b = a[:, :, 0]
        luma = 0.299 * r + 0.587 * g + 0.114 * b
        n = float(w * h)
        nb = dim - 8
        hist = (
            np.bincount(
                np.clip((luma * nb / 256.0).astype(np.int64), 0, nb - 1).ravel(),
                minlength=nb,
            )
            / n
        )
        h256 = np.bincount(
            np.clip(luma.astype(np.int64), 0, 255).ravel(), minlength=256
        ).astype(np.float64)
        p = h256[h256 > 0] / n
        ent = float(-(p * np.log(p)).sum())
        dx = np.abs(np.diff(luma, axis=1)).mean() if w > 1 else 0.0
        dy = np.abs(np.diff(luma, axis=0)).mean() if h > 1 else 0.0
        stats = [
            r.mean() / 255.0,
            g.mean() / 255.0,
            b.mean() / 255.0,
            float(luma.std()) / 255.0,
            w / h,
            math.log(n),
            ent,
            (dx + dy) / 255.0,
        ]
        v = np.concatenate([hist, np.array(stats)])
        return (v / np.linalg.norm(v)).astype(np.float32)

    exp_bmp = expected(rgb, 9, 6)
    np.testing.assert_allclose(np.array(got[1].feature), exp_bmp, rtol=0, atol=1e-7)
    exp_png = expected(gray[:, :, None], 7, 5)
    np.testing.assert_allclose(np.array(got[2].feature), exp_png, rtol=0, atol=1e-7)
    assert got[3].feature is None
    # unit norm on the real path too
    assert abs(float(np.linalg.norm(got[1].feature)) - 1.0) < 1e-5


def test_extract_features_real_jpeg_matches_decoded_stats(spark):
    """real=True features on a baseline JPEG reflect the DECODED pixels:
    the mean-luma stat (index dim-8..dim-6 are channel means) computed from
    the feature vector's unnormalized ratios agrees with decode_images'
    pixel_mean for a grayscale image (all three channel means equal)."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import (
        decode_images,
        extract_features,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 16)).astype(np.float64)
    payload = _encode_jpeg([img], q=_ANNEX_K_LUMA)
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    [feat] = extract_features(df, real=True, dim=16, normalize=False).collect()
    [dec] = decode_images(df, real=True).collect()
    v = np.array(feat.feature, dtype=np.float64)
    # grayscale: mean_r == mean_g == mean_b == pixel_mean/255
    assert abs(v[8] - dec.pixel_mean / 255.0) < 1e-6
    assert abs(v[8] - v[9]) < 1e-12 and abs(v[9] - v[10]) < 1e-12
    # histogram fractions sum to 1
    assert abs(v[:8].sum() - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# audio: WAV (RIFF PCM)
# ---------------------------------------------------------------------------

def _encode_wav(samples, rate=16000, bits=16):
    """Independent in-test RIFF/WAVE PCM encoder (written from the spec):
    samples is (frames, channels) int array; 16-bit little-endian signed or
    8-bit unsigned."""
    import struct

    import numpy as np

    a = np.asarray(samples)
    frames, n_ch = a.shape
    if bits == 16:
        data = a.astype("<i2").tobytes()
    else:
        data = (a + 128).astype(np.uint8).tobytes()
    block = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, rate, rate * block, block, bits
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        body += b"\x00"  # RIFF even padding
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_audio_real_wav_pinned(spark):
    """16-bit stereo and 8-bit mono WAVs decode to stats pinned against an
    independent numpy computation; truncated data chunk and float-format
    WAVs yield NULL stats; non-RIFF payloads sniff as unknown."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import decode_audio

    rng = np.random.default_rng(13)
    stereo = rng.integers(-20000, 20000, size=(500, 2))
    mono8 = rng.integers(-128, 128, size=(300, 1))
    p_stereo = _encode_wav(stereo, rate=44100, bits=16)
    p_mono8 = _encode_wav(mono8, rate=8000, bits=8)
    p_trunc = p_stereo[:-40]
    # float-format WAV: flip audio_format to 3
    p_float = bytearray(p_stereo)
    p_float[20] = 3
    df = spark.createDataFrame(
        [
            (1, bytearray(p_stereo)),
            (2, bytearray(p_mono8)),
            (3, bytearray(p_trunc)),
            (4, bytearray(bytes(p_float))),
            (5, bytearray(b"not audio at all")),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in decode_audio(df, real=True).collect()}

    def expect(a):
        m = a.astype(np.float64).mean(axis=1)
        rms = float(np.sqrt(np.mean(m * m)))
        peak = int(np.abs(a).max())
        zcr = int(np.count_nonzero(m[:-1] * m[1:] < 0)) / (len(m) - 1)
        return rms, peak, round(zcr, 6)

    s = got[1]
    assert (s.format, s.sample_rate, s.n_channels, s.n_samples) == (
        "wav", 44100, 2, 500,
    )
    rms, peak, zcr = expect(stereo)
    assert abs(s.rms - rms) < 1e-9 and s.peak == peak and s.zero_cross_rate == zcr
    m = got[2]
    assert (m.sample_rate, m.n_channels, m.n_samples) == (8000, 1, 300)
    rms8, peak8, zcr8 = expect(mono8.astype(np.float64) * 256.0)
    assert abs(m.rms - rms8) < 1e-9 and m.peak == peak8
    assert got[3].format == "wav" and got[3].rms is None
    assert got[4].format == "wav" and got[4].rms is None
    assert got[5].format == "unknown" and got[5].sample_rate is None


def test_decode_audio_fake_matches_arithmetic(spark):
    """The real=False path is pure Catalyst arithmetic (what the oracle
    mirrors): spot-check the formulas."""
    from clickestream_project_bigdata_spark.operators.multimodal import (
        attach_audio_binary,
        decode_audio,
    )

    docs = spark.createDataFrame(
        [(1, "abcde"), (2, "xy")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in decode_audio(attach_audio_binary(docs)).collect()}
    r1 = got[1]  # n=5: rate=8000*(1+5%3)=24000, ch=1+1=2, samples=250
    assert (r1.sample_rate, r1.n_channels, r1.n_samples) == (24000, 2, 250)
    assert r1.duration_ms == 250 * 1000 // 24000
    r2 = got[2]  # n=2: rate=8000*3=24000? no: 1+2%3=3 -> 24000; ch=1
    assert (r2.sample_rate, r2.n_channels, r2.n_samples) == (24000, 1, 100)


def test_image_dhash_cross_format_and_brightness(spark):
    """dHash is a cross-format perceptual key: identical pixels as PNG and
    BMP hash identically; a brightness-scaled copy (monotone transform)
    keeps the hash on a gradient image; a different image differs; corrupt
    payloads get NULL and are excluded from the dedup groups."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import (
        dedup_images_by_dhash,
        image_dhash,
    )

    rng = np.random.default_rng(21)
    # strong horizontal gradient + mild noise: cell means are well separated
    base = np.tile(np.linspace(30, 220, 36), (24, 1))
    img = np.clip(base + rng.normal(0, 4, base.shape), 0, 255).astype(np.uint8)
    rgb = np.stack([img, img, img], axis=-1)
    dim = np.clip(rgb.astype(np.float64) * 0.85, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=rgb.shape).astype(np.uint8)
    rows = [
        (1, bytearray(_encode_png(rgb, 2))),
        (2, bytearray(_encode_bmp(rgb))),
        (3, bytearray(_encode_bmp(dim))),
        (4, bytearray(_encode_png(other, 2))),
        (5, bytearray(b"\x89PNG\r\n\x1a\nbroken")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in image_dhash(df).collect()}
    assert got[1].dhash == got[2].dhash  # format-independent
    assert got[1].dhash == got[3].dhash  # brightness-independent
    assert got[1].dhash != got[4].dhash
    assert got[5].dhash is None
    groups = dedup_images_by_dhash(df).collect()
    by_canon = {g.canonical_doc_id: g.n_copies for g in groups}
    assert by_canon[1] == 3  # docs 1, 2, 3 collapse; 4 alone; 5 excluded
    assert by_canon[4] == 1
    assert len(groups) == 2


def _encode_gif_anim(frames, palette):
    """Independent in-test ANIMATED GIF encoder: same literal-code LZW per
    frame as _encode_gif, with a Graphic Control Extension before each
    frame (what real animation tools emit) and one shared global table."""
    h = len(frames[0])
    w = len(frames[0][0])
    n_colors = len(palette)
    min_code = max(2, (n_colors - 1).bit_length())
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1

    def lzw(pixels):
        bits = []

        def emit(code):
            for i in range(width):
                bits.append((code >> i) & 1)

        emit(clear)
        for row in pixels:
            for px in row:
                emit(px)
                emit(clear)
        emit(end)
        data = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for j, b in enumerate(bits[i : i + 8]):
                byte |= b << j
            data.append(byte)
        return data

    exp = max(0, (max(2, n_colors) - 1).bit_length() - 1)
    table_n = 2 ** (exp + 1)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | exp)
    out += b"\x00\x00"
    for i in range(table_n):
        out += bytes(palette[i]) if i < n_colors else b"\x00\x00\x00"
    for pixels in frames:
        # Graphic Control Extension: 100 ms delay, no disposal
        out += bytes([0x21, 0xF9, 4, 0x00, 10, 0, 0, 0])
        out.append(0x2C)
        out += (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0)
        out.append(min_code)
        data = lzw(pixels)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_sample_frames_real_animated_gif(spark):
    """real=True frame sampling: a 5-frame animated GIF yields every-2nd
    frame (0, 2, 4) with per-frame pixel stats pinned against the source
    rasters; a still PNG is a 1-frame video; garbage yields one NULL row."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import (
        sample_frames,
    )

    palette = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    frames = [[[i % 4, (i + 1) % 4], [(i + 2) % 4, (i + 3) % 4]] for i in range(5)]
    anim = _encode_gif_anim(frames, palette)
    still = np.full((3, 4, 3), 200, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(anim)),
            (2, bytearray(_encode_png(still, 2))),
            (3, bytearray(b"GIFxx-not-really")),
        ],
        "doc_id long, payload binary",
    )
    got = sample_frames(df, every_nth=2, real=True).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    g1 = sorted(by_doc[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in g1] == [0, 2, 4]
    assert all(r.n_frames == 5 and (r.width, r.height) == (2, 2) for r in g1)
    for r in g1:
        vals = [palette[p][0] for row in frames[r.frame_idx] for p in row]
        expect = sum(vals) / len(vals)  # gray palette: mean == channel val
        assert abs(r.pixel_mean - expect) < 1e-9
        assert r.pixel_min == min(vals) and r.pixel_max == max(vals)
    [p] = by_doc[2]
    assert (p.frame_idx, p.n_frames, p.pixel_mean) == (0, 1, 200.0)
    [bad] = by_doc[3]
    assert bad.frame_idx is None and bad.pixel_mean is None


def test_gif_first_frame_unchanged_after_refactor(spark):
    """decode_images(real=True) still reads the FIRST frame of an animated
    GIF (regression pin for the _gif_decode refactor)."""
    from clickestream_project_bigdata_spark.operators.multimodal import decode_images

    palette = [(0, 0, 0), (255, 255, 255)]
    frames = [[[0, 1], [1, 0]], [[1, 1], [1, 1]]]
    anim = _encode_gif_anim(frames, palette)
    df = spark.createDataFrame([(1, bytearray(anim))], "doc_id long, payload binary")
    [r] = decode_images(df, real=True).collect()
    assert (r.width, r.height, r.pixel_mean) == (2, 2, 127.5)


def test_real_decoders_never_raise_on_fuzz(spark):
    """Robustness: random and format-prefixed garbage through EVERY real
    decode path (images, dhash, audio, frames) must yield NULL-stat rows,
    never an exception — a 100 TB crawl always contains byte soup."""
    import random

    from clickestream_project_bigdata_spark.operators.multimodal import (
        decode_audio,
        decode_images,
        image_dhash,
        sample_frames,
    )

    rng = random.Random(99)
    prefixes = [
        b"", b"\x89PNG\r\n\x1a\n", b"BM", b"\xff\xd8\xff", b"GIF89a",
        b"RIFF", b"RIFF\x00\x00\x00\x00WAVE",
    ]
    rows = []
    for i in range(40):
        pre = prefixes[i % len(prefixes)]
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        rows.append((i, bytearray(pre + body)))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    assert decode_images(df, real=True).count() == 40
    assert image_dhash(df).count() == 40
    assert decode_audio(df, real=True).count() == 40
    out = sample_frames(df, real=True).collect()
    assert {r.doc_id for r in out} == set(range(40))
    # none of the garbage decodes to pixels/samples
    assert all(r.pixel_mean is None for r in out)


def test_neardup_images_by_dhash(spark):
    """A lightly noised re-render (a few flipped hash bits) pairs with the
    original under the banded Hamming join; an unrelated image does not;
    exact duplicates pair at hamming 0."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import (
        image_dhash,
        neardup_images_by_dhash,
    )

    rng = np.random.default_rng(31)
    base = np.tile(np.linspace(20, 235, 27), (18, 1))
    img = np.clip(base + rng.normal(0, 3, base.shape), 0, 255).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)
    # a noised re-render: flips at most a few cell comparisons
    noisy = np.clip(
        rgb.astype(np.float64) + rng.normal(0, 6, rgb.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=rgb.shape).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(_encode_png(rgb, 2))),
            (2, bytearray(_encode_bmp(rgb))),
            (3, bytearray(_encode_bmp(noisy))),
            (4, bytearray(_encode_png(other, 2))),
        ],
        "doc_id long, payload binary",
    )
    hashes = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    noise_bits = bin(hashes[1] ^ hashes[3]).count("1")
    assert noise_bits <= 6, noise_bits  # fixture sanity: noise is light
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in neardup_images_by_dhash(df).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] == noise_bits
    assert not any(4 in p for p in pairs)


def test_image_neardup_pairs_feed_generic_clustering(spark):
    """Composition: neardup_images_by_dhash's (doc_a, doc_b) pairs drop
    straight into dedup.duplicate_clusters — image near-dup groups with
    the same min-label machinery the text corpus uses."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.dedup import (
        duplicate_clusters,
    )
    from clickestream_project_bigdata_spark.operators.multimodal import (
        neardup_images_by_dhash,
    )

    rng = np.random.default_rng(41)
    base = np.tile(np.linspace(10, 245, 36), (24, 1))
    img = np.clip(base + rng.normal(0, 3, base.shape), 0, 255).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)
    noisy = np.clip(
        rgb.astype(np.float64) + rng.normal(0, 5, rgb.shape), 0, 255
    ).astype(np.uint8)
    other = rng.integers(0, 256, size=rgb.shape).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(_encode_png(rgb, 2))),
            (2, bytearray(_encode_bmp(rgb))),
            (3, bytearray(_encode_bmp(noisy))),
            (4, bytearray(_encode_png(other, 2))),
        ],
        "doc_id long, payload binary",
    )
    clusters = {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters(neardup_images_by_dhash(df)).collect()
    }
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert 4 not in clusters  # no edges -> not in the dup graph


def test_image_dhash_tiny_image_no_nan(spark):
    """Images smaller than the 8x9 pooling grid hash deterministically
    (empty cells are 0-luma, not a division by zero)."""
    import numpy as np

    from clickestream_project_bigdata_spark.operators.multimodal import image_dhash

    tiny = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)  # 1x2
    df = spark.createDataFrame(
        [(1, bytearray(_encode_bmp(tiny))), (2, bytearray(_encode_bmp(tiny)))],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.dhash for r in image_dhash(df).collect()}
    assert got[1] is not None and got[1] == got[2]


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF video metadata (VERDICT r8 #6)
# ---------------------------------------------------------------------------


def _box(typ: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + typ + body


def _mvhd_v0(timescale: int, duration: int) -> bytes:
    body = bytes(1) + bytes(3) + bytes(8)  # ver 0, flags, ctime+mtime
    body += timescale.to_bytes(4, "big") + duration.to_bytes(4, "big")
    body += bytes(80)  # rate/volume/reserved/matrix/predefines/next_track
    return _box(b"mvhd", body)


def _mvhd_v1(timescale: int, duration: int) -> bytes:
    body = bytes([1]) + bytes(3) + bytes(16)  # ver 1, flags, 8-byte times
    body += timescale.to_bytes(4, "big") + duration.to_bytes(8, "big")
    body += bytes(80)
    return _box(b"mvhd", body)


def _tkhd_v0(track_id: int, w: int, h: int) -> bytes:
    body = bytes(4) + bytes(8)  # ver+flags, ctime+mtime
    body += track_id.to_bytes(4, "big") + bytes(4) + bytes(4)  # id, res, dur
    body += bytes(8) + bytes(8)  # reserved, layer/alt/volume/reserved
    body += bytes(36)  # matrix
    body += (w << 16).to_bytes(4, "big") + (h << 16).to_bytes(4, "big")
    return _box(b"tkhd", body)


def _trak(tkhd: bytes, codec: bytes | None = None) -> bytes:
    inner = tkhd
    if codec is not None:
        entry = _box(codec, bytes(70))  # opaque sample-entry body
        stsd = _box(b"stsd", bytes(4) + (1).to_bytes(4, "big") + entry)
        inner += _box(b"mdia", _box(b"minf", _box(b"stbl", stsd)))
    return _box(b"trak", inner)


def _mp4(mvhd: bytes, *traks: bytes, brand: bytes = b"isom") -> bytes:
    return _box(b"ftyp", brand + bytes(4)) + _box(b"moov", mvhd + b"".join(traks))


def test_mp4_metadata_hand_built(spark):
    from clickestream_project_bigdata_spark.operators.multimodal import (
        REAL_VIDEO_SCHEMA,
        decode_video,
    )

    # movie: timescale 600, duration 3000 ticks -> 5000 ms; video track
    # 320x240 avc1 + audio track 0x0 mp4a
    good = _mp4(
        _mvhd_v0(600, 3000),
        _trak(_tkhd_v0(1, 320, 240), b"avc1"),
        _trak(_tkhd_v0(2, 0, 0), b"mp4a"),
    )
    v1 = _mp4(_mvhd_v1(1000, 1500), _trak(_tkhd_v0(1, 64, 32), b"hvc1"))
    rows = [(1, bytearray(good)), (2, bytearray(v1)), (3, bytearray(b"\x00" * 40))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_video(df, real=True).collect()}
    assert [f.name for f in REAL_VIDEO_SCHEMA] == list(
        decode_video(df, real=True).columns
    )
    g = got[1]
    assert (g.format, g.major_brand, g.timescale) == ("mp4", "isom", 600)
    assert (g.duration_ms, g.n_tracks) == (5000, 2)
    assert (g.width, g.height, g.codec) == (320, 240, "avc1")
    assert g.n_bytes == len(good)
    assert (got[2].timescale, got[2].duration_ms) == (1000, 1500)
    assert (got[2].width, got[2].height, got[2].codec) == (64, 32, "hvc1")
    assert got[3].format == "unknown" and got[3].timescale is None


def test_mp4_metadata_largesize_and_malformed(spark):
    import random
    import struct

    from clickestream_project_bigdata_spark.operators.multimodal import (
        _mp4_metadata,
    )

    # moov framed as a 64-bit largesize box (size field == 1)
    inner = _mvhd_v0(90000, 90000) + _trak(_tkhd_v0(1, 16, 16), b"av01")
    large_moov = (
        struct.pack(">I", 1) + b"moov" + struct.pack(">Q", 16 + len(inner)) + inner
    )
    payload = _box(b"ftyp", b"mp42" + bytes(4)) + large_moov
    brand, ts, dur_ms, n_tracks, w, h, codec = _mp4_metadata(payload)
    assert (brand, ts, dur_ms, n_tracks, w, h, codec) == (
        "mp42", 90000, 1000, 1, 16, 16, "av01",
    )

    # malformed inputs must return None, never raise: byte soup, truncated
    # boxes, size pointing past EOF, zero-size headers, empty payload
    rng = random.Random(7)
    for _ in range(200):
        soup = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        assert _mp4_metadata(soup) is None or True  # must simply not raise
    assert _mp4_metadata(b"") is None
    assert _mp4_metadata(payload[: len(payload) // 2]) is None  # truncated moov
    # header claims a 1 GiB box with 12 bytes behind it
    evil = struct.pack(">I", 1 << 30) + b"moov" + bytes(12)
    assert _mp4_metadata(evil) is None
    # largesize marker (size==1) but no 64-bit size field behind it
    assert _mp4_metadata(struct.pack(">I", 1) + b"moov" + bytes(4)) is None


def test_decode_video_fake_path_matches_arithmetic(spark):
    from clickestream_project_bigdata_spark.operators.multimodal import (
        attach_video_binary,
        decode_video,
    )

    docs = spark.createDataFrame([(1, "abcde"), (2, "xy")], "doc_id long, text string")
    got = {r.doc_id: r for r in decode_video(attach_video_binary(docs)).collect()}
    assert got[1].n_bytes == 5 and got[1].n_frames == 5
    assert got[1].duration_ms == 200  # 5 frames x 40 ms
    assert (got[1].width, got[1].height) == (160 * 2, 120 * 2)  # 1 + 5%4 == 2
    assert (got[2].width, got[2].height) == (160 * 3, 120 * 3)
