#!/usr/bin/env python3
"""Craft minimal VP8L streams and use libwebp as the decode oracle to
pin down the exact prefix-code conventions."""
import ctypes

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
lib = ctypes.CDLL(SO)
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]

class BW:
    def __init__(self):
        self.bits = []
    def w(self, v, n):
        for i in range(n):
            self.bits.append((v >> i) & 1)
    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i:i+8]):
                b |= bit << j
            out.append(b)
        return bytes(out)

def canonical(lengths, msb_first=True):
    """symbol -> (code, len), canonical RFC1951 by (len, symbol)."""
    pairs = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    codes = {}
    code = 0
    prev = None
    for l, s in pairs:
        if prev is not None:
            code = (code + 1) << (l - prev)
        prev = l
        codes[s] = (code, l)
    return codes

def put_code(bw, codes, sym, msb_first=True):
    code, l = codes[sym]
    if msb_first:
        for i in range(l - 1, -1, -1):
            bw.w((code >> i) & 1, 1)
    else:
        bw.w(code, l)

CLC_ORDER = [17,18,0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16]

def write_simple(bw, syms):
    bw.w(1, 1)
    bw.w(len(syms) - 1, 1)
    if len(syms) == 1 and syms[0] <= 1:
        bw.w(0, 1); bw.w(syms[0], 1)
    else:
        bw.w(1, 1); bw.w(syms[0], 8)
        if len(syms) == 2:
            bw.w(syms[1], 8)

def write_normal(bw, lengths, tokens, msb_first=True):
    """tokens: list of (tokval, extra, extrabits)"""
    bw.w(0, 1)
    # clc lengths over the token values used
    from collections import Counter
    clc_hist = Counter(t[0] for t in tokens)
    # build a clc: assign lengths by simple heuristic (complete code)
    # here caller passes clc lengths explicitly via `lengths`
    clc = lengths
    ncl = 19
    while ncl > 4 and clc[CLC_ORDER[ncl-1]] == 0:
        ncl -= 1
    bw.w(ncl - 4, 4)
    for i in range(ncl):
        bw.w(clc[CLC_ORDER[i]], 3)
    bw.w(0, 1)  # no max_symbol cap
    codes = canonical(clc)
    for tv, extra, ebits in tokens:
        put_code(bw, codes, tv, msb_first)
        if ebits:
            bw.w(extra, ebits)

def craft(msb_first=True):
    # 4x1 image, pixels: greens g in {10, 200}, red=blue=0, alpha=255
    w, h = 4, 1
    bw = BW()
    bw.w(0x2f, 8)
    bw.w(w - 1, 14); bw.w(h - 1, 14)
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version
    bw.w(0, 1)  # no transforms
    bw.w(0, 1)  # no cache
    bw.w(0, 1)  # no meta
    # GREEN code (alphabet 280): lengths: sym10 -> 1 bit, sym200 -> 1 bit
    # via tokens: rep18 skip 10, lit 1, rep18 skip 189, lit 1, rest zero
    # clc needs codes for {18, 1}: lengths: clc[18]=1, clc[1]=1
    clc = [0]*19
    clc[18] = 1; clc[1] = 1
    tokens = [
        (18, 10 - 11 + 0, 7),   # skip 10? rep18 = 11+extra -> need 10: NOT possible (min 11)
    ]
    # skip 10 impossible with 18 (min 11); use 17 (3..10): skip 10 = 17 extra 7
    clc = [0]*19
    clc[17] = 2; clc[18] = 2; clc[1] = 1
    tokens = [
        (17, 7, 3),             # skip 10 (3+7)
        (1, 0, 0),              # len[10] = 1
        (18, 189 - 11, 7),      # skip 189 -> 11..200-11=189: extra=178
        (1, 0, 0),              # len[200] = 1
    ]
    write_normal(bw, clc, tokens, msb_first)
    # RED, BLUE simple single 0; ALPHA simple single 255; DIST single 0
    write_simple(bw, [0])
    write_simple(bw, [0])
    write_simple(bw, [255])
    write_simple(bw, [0])
    # pixels: greens 10, 200, 200, 10 -> green code: sym10/sym200 1 bit each
    gcodes = canonical([1 if s in (10, 200) else 0 for s in range(280)])
    for g in (10, 200, 200, 10):
        put_code(bw, gcodes, g, msb_first)
    payload = bw.bytes()
    riff = b"RIFF" + (4 + 8 + len(payload) + (len(payload) & 1)).to_bytes(4, "little") + b"WEBP" \
        + b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        riff += b"\x00"
    return riff, [(10, 200, 200, 10)]

def try_decode(webp):
    W = ctypes.c_int(); H = ctypes.c_int()
    p = lib.WebPDecodeRGBA(webp, len(webp), ctypes.byref(W), ctypes.byref(H))
    if not p:
        return None
    w, h = W.value, H.value
    out = [(p[i*4], p[i*4+1], p[i*4+2], p[i*4+3]) for i in range(w*h)]
    return w, h, out

if __name__ == "__main__":
    for msb in (True, False):
        webp, _ = craft(msb)
        r = try_decode(webp)
        print(f"msb_first={msb}: {'REJECTED' if r is None else r}")
