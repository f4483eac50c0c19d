#!/usr/bin/env python3
"""Independent VP8L header/stream tracer (RFC 9649) to localize where
the Scala decoder's bit position diverges on libwebp streams."""
import sys

data = open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vp8ldbg/g01.webp", "rb").read()
# RIFF walk
assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
off = 12
while True:
    cc = data[off:off+4]; size = int.from_bytes(data[off+4:off+8], "little")
    if cc == b"VP8L": payload = data[off+8:off+8+size]; break
    off += 8 + size + (size & 1)
assert payload[0] == 0x2F

class BR:
    def __init__(self, b, start=1):
        self.b = b; self.pos = start * 8
    def read(self, n):
        v = 0
        for i in range(n):
            byte = self.b[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v
    def bits_used(self): return self.pos - 8

br = BR(payload)
w = br.read(14) + 1; h = br.read(14) + 1
alpha = br.read(1); ver = br.read(3)
print(f"dims {w}x{h} alpha={alpha} ver={ver} bitpos={br.bits_used()}")

CLC_ORDER = [17,18,0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16]

def build_canonical(lengths):
    # map canonical codes: list of (length, symbol) sorted
    maxlen = max(lengths) if lengths else 0
    codes = {}
    code = 0
    for l in range(1, maxlen+1):
        for s, sl in enumerate(lengths):
            if sl == l:
                codes[(l, code)] = s
                code += 1
        code <<= 1
    return codes

def read_sym(br, lengths):
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) == 1:
        return nz[0]
    codes = build_canonical(lengths)
    code = 0; l = 0
    while l <= 15:
        code = (code << 1) | br.read(1)
        l += 1
        if (l, code) in codes:
            return codes[(l, code)]
    raise ValueError("bad sym")

def read_prefix_code(br, alphabet, tag):
    simple = br.read(1)
    lengths = [0]*alphabet
    if simple:
        numsym = br.read(1) + 1
        first8 = br.read(1)
        s0 = br.read(8) if first8 else br.read(1)
        lengths[s0] = 1
        syms = [s0]
        if numsym == 2:
            s1 = br.read(8)
            lengths[s1] = 1
            syms.append(s1)
        print(f"  [{tag}] simple syms={syms} bitpos={br.bits_used()}")
    else:
        ncl = 4 + br.read(4)
        clc = [0]*19
        for i in range(ncl):
            clc[CLC_ORDER[i]] = br.read(3)
        # completeness check
        kraft = sum((1 << (15 - l)) for l in clc if l)
        nz = sum(1 for l in clc if l)
        print(f"  [{tag}] normal ncl={ncl} clc={clc} kraft={kraft}/{1<<15} nz={nz} bitpos={br.bits_used()}")
        max_symbol = alphabet
        if br.read(1):
            length_nbits = 2 + 2 * br.read(3)
            max_symbol = 2 + br.read(length_nbits)
            print(f"    max_symbol={max_symbol}")
        sym = 0; prev = 8
        while sym < alphabet and max_symbol > 0:
            max_symbol -= 1
            s = read_sym(br, clc)
            if s < 16:
                lengths[sym] = s; sym += 1
                if s: prev = s
            elif s == 16:
                rep = 3 + br.read(2)
                for _ in range(rep): lengths[sym] = prev; sym += 1
            elif s == 17:
                sym += 3 + br.read(3)
            else:
                sym += 11 + br.read(7)
        used = sum(1 for l in lengths if l)
        print(f"    lengths done sym={sym} used={used} bitpos={br.bits_used()}")
    return lengths

def lz77_value(br, code):
    if code < 4: return code + 1
    extra = (code - 2) >> 1
    return ((2 + (code & 1)) << extra) + br.read(extra) + 1

def decode_image(br, xsize, ysize, level0, depth=0):
    ind = "  " * depth
    w = xsize
    if level0:
        while br.read(1):
            t = br.read(2)
            print(f"{ind}transform {t} bitpos={br.bits_used()}")
            if t == 3:  # color indexing
                nc = br.read(8) + 1
                print(f"{ind}  palette {nc}")
                decode_image(br, nc, 1, False, depth+1)
                if nc <= 2: w = (w + 7) // 8
                elif nc <= 4: w = (w + 3) // 4
                elif nc <= 16: w = (w + 1) // 2
            elif t in (0, 1):  # predictor / color
                bits = br.read(3) + 2
                tw = (w + (1 << bits) - 1) >> bits
                th = (ysize + (1 << bits) - 1) >> bits
                print(f"{ind}  bits={bits} tiles {tw}x{th}")
                decode_image(br, tw, th, False, depth+1)
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
    print(f"{ind}cache_bits={cache_bits} bitpos={br.bits_used()}")
    meta = None; meta_bits = 0; meta_w = 0
    num_groups = 1
    if level0 and br.read(1):
        meta_bits = 2 + br.read(3)
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (ysize + (1 << meta_bits) - 1) >> meta_bits
        print(f"{ind}meta bits={meta_bits} {meta_w}x{meta_h}")
        meta = decode_image(br, meta_w, meta_h, False, depth+1)
        num_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    print(f"{ind}num_groups={num_groups} bitpos={br.bits_used()}")
    groups = []
    for g in range(num_groups):
        g0 = read_prefix_code(br, 256 + 24 + cache_size, f"g{g}.green")
        g1 = read_prefix_code(br, 256, f"g{g}.red")
        g2 = read_prefix_code(br, 256, f"g{g}.blue")
        g3 = read_prefix_code(br, 256, f"g{g}.alpha")
        g4 = read_prefix_code(br, 40, f"g{g}.dist")
        groups.append((g0, g1, g2, g3, g4))
    # pixel loop
    n = w * ysize
    out = [0]*n
    cache = [0]*cache_size
    pos = 0; x = 0; y = 0
    def ins(argb):
        if cache_size:
            cache[(0x1e35a7bd * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
    group = groups[0]
    while pos < n:
        if meta is not None:
            tile = (y >> meta_bits) * meta_w + (x >> meta_bits)
            group = groups[(meta[tile] >> 8) & 0xFFFF]
        s = read_sym(br, group[0])
        if s < 256:
            r = read_sym(br, group[1]); b = read_sym(br, group[2])
            a = read_sym(br, group[3])
            argb = (a << 24) | (r << 16) | (s << 8) | b
            out[pos] = argb; ins(argb)
            pos += 1; x += 1
            if x >= w: x = 0; y += 1
        elif s < 280:
            length = lz77_value(br, s - 256)
            dcode = read_sym(br, group[4])
            dist_code = lz77_value(br, dcode)
            # plane code mapping
            if dist_code > 120:
                dist = dist_code - 120
            else:
                DIST = [(0,1),(1,0),(1,1),(-1,1),(0,2),(2,0),(1,2),(-1,2),(2,1),(-2,1),(2,2),(-2,2),(0,3),(3,0),(1,3),(-1,3),(3,1),(-3,1),(2,3),(-2,3),(3,2),(-3,2),(0,4),(4,0),(1,4),(-1,4),(4,1),(-4,1),(3,3),(-3,3),(2,4),(-2,4),(4,2),(-4,2),(0,5),(5,0),(1,5),(-1,5),(5,1),(-5,1),(3,4),(-3,4),(4,3),(-4,3),(0,6),(6,0),(2,5),(-2,5),(5,2),(-5,2),(1,6),(-1,6),(6,1),(-6,1),(3,5),(-3,5),(5,3),(-5,3),(0,7),(7,0),(2,6),(-2,6),(6,2),(-6,2),(4,4),(-4,4),(1,7),(-1,7),(7,1),(-7,1),(3,6),(-3,6),(6,3),(-6,3),(0,8),(8,0),(4,5),(-4,5),(5,4),(-5,4),(2,7),(-2,7),(7,2),(-7,2),(1,8),(-1,8),(8,1),(-8,1),(5,5),(-5,5),(3,7),(-3,7),(7,3),(-7,3),(4,6),(-4,6),(6,4),(-6,4),(2,8),(-2,8),(8,2),(-8,2),(5,6),(-5,6),(6,5),(-6,5),(3,8),(-3,8),(8,3),(-8,3),(4,7),(-4,7),(7,4),(-7,4),(5,7),(-5,7),(7,5),(-7,5),(6,6),(-6,6),(4,8),(-4,8),(8,4),(-8,4),(6,7),(-6,7),(7,6),(-7,6),(5,8),(-5,8),(8,5),(-8,5),(6,8),(-6,8),(8,6),(-8,6),(7,7),(-7,7),(7,8),(-7,8),(8,7),(-8,7),(8,8),(-8,8)]
                dx, dy = DIST[dist_code - 1]
                dist = dy * w + dx
                if dist < 1: dist = 1
            for _ in range(length):
                argb = out[pos - dist]
                out[pos] = argb; ins(argb)
                pos += 1
            x = pos % w; y = pos // w
        else:
            out[pos] = cache[s - 280]
            pos += 1; x += 1
            if x >= w: x = 0; y += 1
    print(f"{ind}pixels done bitpos={br.bits_used()}")
    return out

decode_image(br, w, h, True)
print("total bits:", br.bits_used(), "of", (len(payload)-1)*8)
