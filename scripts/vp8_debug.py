#!/usr/bin/env python3
"""Debug driver for the foreign-VP8 bisect: generate graded foreign
streams into /tmp/vp8dbg, and compare our decoder's dumped planes
(from Vp8DebugSpec) against libwebp's reference decode. Also decodes
our own encoder's stream with libwebp (reverse interop)."""
import ctypes, os, struct, sys, zlib

SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
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

D = "/tmp/vp8dbg"
os.makedirs(D, exist_ok=True)

def enc(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(bytes(rgb), w, h, w * 3, q, ctypes.byref(out))
    assert n > 0
    b = bytes(out[i] for i in range(n))
    lib.WebPFree(out)
    return b

def dec_yuv(webp):
    W = ctypes.c_int(); H = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
    ys = ctypes.c_int(); uvs = ctypes.c_int()
    yp = lib.WebPDecodeYUV(webp, len(webp), ctypes.byref(W), ctypes.byref(H),
                           ctypes.byref(up), ctypes.byref(vp),
                           ctypes.byref(ys), ctypes.byref(uvs))
    if not yp: return None
    w, h = W.value, H.value
    cw, ch = (w+1)//2, (h+1)//2
    y = bytes(yp[r*ys.value+c] for r in range(h) for c in range(w))
    u = bytes(up[r*uvs.value+c] for r in range(ch) for c in range(cw))
    v = bytes(vp[r*uvs.value+c] for r in range(ch) for c in range(cw))
    lib.WebPFree(yp)
    return w, h, y, u, v

def flat(w, h, val):
    return bytes([val]) * (w*h*3)

def grad(w, h):
    b = bytearray()
    for y in range(h):
        for x in range(w):
            g = (x*255)//max(1,w-1)
            b += bytes([g,g,g])
    return bytes(b)

def photo(w, h, seed):
    buf = bytearray(w*h*3)
    for y in range(h):
        for x in range(w):
            i=(y*w+x)*3
            v=(x*255)//max(1,w-1); u=(y*255)//max(1,h-1)
            t=zlib.crc32(struct.pack("<III",x//4,y//4,seed))&0xff
            buf[i]=(v+t//3)%256; buf[i+1]=(u+(t>>2))%256
            buf[i+2]=((v+u)//2+(t>>1))%256
    return bytes(buf)

cases = [
    ("f01", flat(16,16,128), 16,16, 100.0),
    ("f02", flat(16,16,57),  16,16, 75.0),
    ("f03", grad(16,16),     16,16, 100.0),
    ("f04", grad(16,16),     16,16, 75.0),
    ("f05", grad(32,32),     32,32, 75.0),
    ("f06", photo(16,16,9),  16,16, 75.0),
    ("f07", photo(32,32,9),  32,32, 75.0),
    ("f08", photo(64,48,1),  64,48, 75.0),
]

mode = sys.argv[1] if len(sys.argv) > 1 else "gen"
if mode == "gen":
    for name, rgb, w, h, q in cases:
        webp = enc(rgb, w, h, q)
        open(f"{D}/{name}.webp","wb").write(webp)
        ww, hh, y, u, v = dec_yuv(webp)
        open(f"{D}/{name}.ref.y","wb").write(y)
        open(f"{D}/{name}.ref.u","wb").write(u)
        open(f"{D}/{name}.ref.v","wb").write(v)
        print(name, w, h, len(webp), "bytes")
elif mode == "cmp":
    for name, rgb, w, h, q in cases:
        try:
            mine_y = open(f"{D}/{name}.y.bin","rb").read()
        except FileNotFoundError:
            print(name, "no dump (rejected?)"); continue
        ref_y = open(f"{D}/{name}.ref.y","rb").read()
        bad = [i for i in range(len(ref_y)) if mine_y[i]!=ref_y[i]]
        if not bad:
            # check chroma too
            mu = open(f"{D}/{name}.u.bin","rb").read()
            ru = open(f"{D}/{name}.ref.u","rb").read()
            mv = open(f"{D}/{name}.v.bin","rb").read()
            rv = open(f"{D}/{name}.ref.v","rb").read()
            ub = sum(1 for i in range(len(ru)) if mu[i]!=ru[i])
            vb = sum(1 for i in range(len(rv)) if mv[i]!=rv[i])
            print(name, f"Y EXACT; U bad={ub} V bad={vb}")
        else:
            i0 = bad[0]
            print(name, f"Y bad={len(bad)}/{len(ref_y)} first=({i0%w},{i0//w})",
                  f"got={mine_y[i0]} want={ref_y[i0]}")
elif mode == "mine":
    webp = open(f"{D}/mine.webp","rb").read()
    r = dec_yuv(webp)
    if r is None:
        print("libwebp REJECTED our stream")
    else:
        w,h,y,u,v = r
        mine_y = open(f"{D}/mine.y.bin","rb").read()
        bad = sum(1 for i in range(len(y)) if y[i]!=mine_y[i])
        print(f"libwebp decoded our stream {w}x{h}; Y plane diff={bad}/{len(y)}")
