#!/usr/bin/env python3
"""Extract RFC 6386's literal VP8 data tables (Section 13.4/13.5
coefficient probability + update-gate arrays, Section 11.5 keyframe
B-mode table, Section 14.1 dc/ac quantizer lookups) from the system
libwebp binary, which embeds them verbatim, and emit them as Scala
array literals for graft.multimodal.Vp8Tables.

The tables themselves are published data: RFC 6386 includes them as
literal arrays in its reference-code sections. The local shared
library is only a convenient carrier for exact values (no network in
this environment). Extraction is anchored on the first rows of each
table and validated structurally (sizes, value ranges, monotonicity);
the end-to-end proof is the Scala Vp8Spec foreign-stream fixture this
script also generates: a libwebp-ENCODED lossy stream must decode
bit-exactly (Y/U/V planes) against libwebp's own decoder output.
"""
import ctypes, struct, base64, sys, zlib

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
blob = open(SO, "rb").read()

def find_all(needle):
    out, i = [], 0
    while True:
        j = blob.find(needle, i)
        if j < 0: return out
        out.append(j); i = j + 1

# --- coefficient token probabilities [4][8][3][11] = 1056 bytes -----
# Anchor: the table's [0][1][0] row; [0][0] is the unused all-128
# filler block (type-0 band-0 is never read), so the table starts 33
# bytes before the anchor.
coef_anchor = bytes([128] * 33 +
                    [253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128])
hits = find_all(coef_anchor)
assert len(hits) >= 1, f"coef anchor hits: {hits}"
coef_off = hits[0]
coef = blob[coef_off:coef_off + 1056]
assert all(1 <= b <= 255 for b in coef), "coef probs out of range"
if len(hits) > 1:
    assert all(blob[h:h+1056] == coef for h in hits), "copies disagree"
print(f"CoeffsProba0 @ {coef_off:#x}; hits={len(hits)}")

# --- coefficient update gates [4][8][3][11] = 1056 bytes ------------
# Same layout: [0][0] is an unused all-255 filler block, then
# [0][1][0] begins {176, 246, 255, ...}.
upd_anchor = b"\xff" * 33 + bytes([176, 246, 255])
uhits = find_all(upd_anchor)
assert len(uhits) >= 1, f"update anchor hits: {uhits}"
upd_off = uhits[0]
upd = blob[upd_off:upd_off + 1056]
assert all(1 <= b <= 255 for b in upd), "update probs out of range"
if len(uhits) > 1:
    assert all(blob[h:h+1056] == upd for h in uhits), "upd copies disagree"
print(f"CoeffsUpdateProba @ {upd_off:#x}; hits={len(uhits)}; "
      f"n255={upd.count(255)}")

# --- keyframe B-mode probabilities [10][10][9] = 900 bytes ----------
bmode_anchor = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
bhits = find_all(bmode_anchor)
assert len(bhits) >= 1, f"bmode anchor hits: {bhits}"
bmode_off = bhits[0]
bmode = blob[bmode_off:bmode_off + 900]
assert all(1 <= b <= 255 for b in bmode), "bmode probs out of range"
print(f"kBModesProba @ {bmode_off:#x}; hits={len(bhits)}")

# --- quantizer lookups: uint8[128] dc, uint16[128] ac ---------------
dc_anchor = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13])
dhits = find_all(dc_anchor)
assert len(dhits) >= 1, f"dc anchor hits: {dhits}"
dc_off = dhits[0]
dc = list(blob[dc_off:dc_off + 128])
assert dc[0] == 4 and dc[-1] == 157 and \
    all(dc[i] <= dc[i+1] for i in range(127)), dc[:16]
print(f"DcTable @ {dc_off:#x}; last={dc[-1]}")

ac_anchor = struct.pack("<9H", 4, 5, 6, 7, 8, 9, 10, 11, 12)
ahits = find_all(ac_anchor)
assert len(ahits) >= 1, f"ac anchor hits: {ahits}"
ac_off = ahits[0]
ac = list(struct.unpack("<128H", blob[ac_off:ac_off + 256]))
assert ac[-1] == 284 and all(ac[i] <= ac[i+1] for i in range(127)), ac[:16]
print(f"AcTable @ {ac_off:#x}; last={ac[-1]}")

# --- ctypes round-trip fixture --------------------------------------
lib = ctypes.CDLL(SO)
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.c_int)]

def synth_rgb(w, h, seed):
    # deterministic photo-ish pattern: gradients + blocks + a seeded hash
    buf = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            v = (x * 255) // max(1, w - 1)
            u = (y * 255) // max(1, h - 1)
            t = zlib.crc32(struct.pack("<III", x // 4, y // 4, seed)) & 0xff
            buf[i] = (v + t // 3) % 256
            buf[i + 1] = (u + (t >> 2)) % 256
            buf[i + 2] = ((v + u) // 2 + (t >> 1)) % 256
    return bytes(buf)

fixtures = []
for (w, h, q, seed) in [(64, 48, 75.0, 1), (48, 40, 40.0, 2),
                        (33, 21, 90.0, 3)]:
    rgb = synth_rgb(w, h, seed)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
    assert n > 0
    webp = bytes(out[i] for i in range(n))
    lib.WebPFree(out)
    # reference YUV decode
    W = ctypes.c_int(); H = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
    ystride = ctypes.c_int(); uvstride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(webp, n, ctypes.byref(W), ctypes.byref(H),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(ystride), ctypes.byref(uvstride))
    assert W.value == w and H.value == h
    cw, ch = (w + 1) // 2, (h + 1) // 2
    ys = ystride.value; uvs = uvstride.value
    yplane = bytes(yp[r * ys + c] for r in range(h) for c in range(w))
    uplane = bytes(up[r * uvs + c] for r in range(ch) for c in range(cw))
    vplane = bytes(vp[r * uvs + c] for r in range(ch) for c in range(cw))
    lib.WebPFree(yp)
    fixtures.append((w, h, webp, yplane, uplane, vplane))
    print(f"fixture {w}x{h} q={q}: {n} webp bytes")

# --- emit Scala -----------------------------------------------------
def scala_ints(name, vals, per=16, typ="Int"):
    rows = []
    for i in range(0, len(vals), per):
        rows.append("    " + ", ".join(str(v) for v in vals[i:i+per]))
    return (f"  val {name}: Array[Int] = Array(\n" +
            ",\n".join(rows) + ")\n")

with open("/tmp/vp8_tables.scala", "w") as f:
    f.write(scala_ints("CoefProbsFlat", list(coef)))
    f.write(scala_ints("CoefUpdateProbsFlat", list(upd)))
    f.write(scala_ints("KfBModeProbFlat", list(bmode)))
    f.write(scala_ints("DcQLookup", dc))
    f.write(scala_ints("AcQLookup", ac))

with open("/tmp/vp8_fixture.txt", "w") as f:
    for (w, h, webp, yb, ub, vb) in fixtures:
        f.write(f"{w} {h}\n")
        for b in (webp, yb, ub, vb):
            f.write(base64.b64encode(b).decode() + "\n")
print("wrote /tmp/vp8_tables.scala and /tmp/vp8_fixture.txt")
