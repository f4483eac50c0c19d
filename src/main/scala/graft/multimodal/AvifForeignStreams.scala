package graft.multimodal

/** Foreign AVIF conformance streams: three files produced by an
  * INDEPENDENT encoder stack (libavif over a real AV1 encoder) at
  * varied dims (including odd), chroma formats (4:4:4, 4:2:0) and
  * bit depths (8, 10). [[Mp4Codec.parseAvif]] must recover the
  * brand, ispe dims, pixi depth, iinf item count and av1C presence
  * from the HEIF item layer — the q213 oracle pins the known
  * parameters, so the metadata walk is validated against a real
  * encoder's box layout, not this repo's own writer.
  */
object AvifForeignStreams {
  final case class AvifFx(w: Int, h: Int, depth: Int, avifB64: String)

  val all: IndexedSeq[AvifFx] = IndexedSeq(
    AvifFx(64, 48, 8,
      "AAAAIGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZk1BMUEAAADybWV0YQAAAAAAAAAoaGRscgAA" +
      "AAAAAAAAcGljdAAAAAAAAAAAAAAAAGxpYmF2aWYAAAAADnBpdG0AAAAAAAEAAAAeaWxvYwAA" +
      "AABEAAABAAEAAAABAAABGgAAGBIAAAAoaWluZgAAAAAAAQAAABppbmZlAgAAAAABAABhdjAx" +
      "Q29sb3IAAAAAamlwcnAAAABLaXBjbwAAABRpc3BlAAAAAAAAAEAAAAAwAAAAEHBpeGkAAAAA" +
      "AwgICAAAAAxhdjFDgSAAAAAAABNjb2xybmNseAACAAIAAoAAAAAXaXBtYQAAAAAAAAABAAEE" +
      "AQKDBAAAGBptZGF0EgAKBjgVf72CQDKFMBAAAN1LirAc7VXj/AuLi1apEHPI0Hscn0VSZdKC" +
      "lx2BNiSjDF7AF7HyWC3L+r9jrq3//+DuqE525699ZSpU79LZ1iVhQ5ZG4wTr4qR0kousCzwX" +
      "iC0bFBzKGyLBz4N/6/JWFDovfeCLazfGzG33vb7ieL+Q0YMl4SjhimyI2gfaPNQCbssqJHxa" +
      "lbQMTvXUFA+hiVltPuDsIyWRV6LkkYxOlNuH7dgGhiKwNyos5EfaJJWi+1eqNiVQR5wM22jP" +
      "d5Ob6PHWkME4f5K+oqtWUP/////DE3h/eh+5+3lzF9m1qZ1H7n7ebWbf7iioEU8soq/xAFbW" +
      "FqPRZ9593xLQ5qu8i2aEkW7De++1epP2/2NvF99Hmbjg3XztC8Xsf///95H8GC7nRyVa6VqF" +
      "Gai12NWlOUo3Y0o3ZXZWLstwWZMU3gQCiSBtDO6R9zNRuCsG2pjPBlOZqHNjmVZYZdofba6X" +
      "v/sqD+e6MiwqsYu9ERpNRL7so+4v4tVe9ao8xR463vIt3Du7wuNFccinQ/iTHvbnCJ4ekyJM" +
      "k6ddCUoSjhPehFWIGEbJGvLBZ92GyYyqMknceU+tUjCJNj+zZ2fQwODX4z0tj4dzP3srvSMw" +
      "MBn/MuuIPJaTelSyu3hvjdC5K8iM4OgRvbBiBNP/Kw9c/RhVzMNqWRHwJZpvQv/hzRvM9dFr" +
      "IrIq7VBrIr0jusisisisiskfDja5WhndIdClg9D+tUitGjg9ZXI29R7DZk3Pl0kL0BPQe+29" +
      "piYR8LEm2xCm3EAqUfv05ZdpS7e7dZRvgZ8cOyrt7t1nxn3uA/p5nqjoGfdotnCxnTfgRF6T" +
      "X2vpVjLhftrnQWa2JkGoDYLYtb3BUQUkZymEgpUHbHNdRxNrZnMtoFvulJeUEG95ZT8b6ZOK" +
      "KcxyuVuVuNruuVuwKi5W5W5W5W5XT8X3stUtgung/0k/7l4ITAbj7v7ujHDRjtlxrvu/u6O2" +
      "O7u/6eYl/Sh8/vC18h5IeRAU0780F+5LIKz/g/Qe3eb60AB/d7d9OKnt3t3t3t3uBFP5Gcqc" +
      "C0LkLfja7rlbsVBQuQt+VuWAufmegcnzLcCr0+P1YRkiC2q1Qeas2TM6NhPak7Xs5M5M1pVs" +
      "5NE5KzkzkzkzkzlO251c8C8fCYxYBVdUBDA4MRB7qmPh3NJS5guoM29seOs5aIbCyVHo98uK" +
      "c3HTLpRfxjazWMCiTzvBqdKHTNtJGaRnS/o+iwznKPzpYWd1oJ2brO6z0ZeTInmqjHwDj2pr" +
      "zISm3nbXvZMbC+xbjyLBRBvd4YtkrfwpYnUeRudyAdOnqvhjXgwm7IOXwzt4QA0Y/0a8/i98" +
      "x+badl1bHXkRm/gWKxGt4Jr4L0WK+D3tQCcnIm8hM0gHJBThn13iKISl5gj0jXC5BhQweIuq" +
      "YFrA3O/49vJEY/XYwAtaKfNpa/jGLaExilQbHIq7VVriWmCNXxsxjh4Odop82ltRq0e6ChJY" +
      "QNSTI6D8EgbT/4AcZM9DHNoEZQPedhvvwrDY/BdDdDdA/DRZtTYpdIRFLeBxTL0y88cFVI69" +
      "NUjxwQcnZE5Jfau31w2vzVtIj2u3hECquVMoWfsH62cEPW77CZI1WpRoc+EYBCBhibgAYMki" +
      "UPM0E5N+T2Aruap9C/eGqgdBZpUdXPO5qn0LwZEJ/WqRJGjqWj40p/TEzWw0rvQHIMQY3N9s" +
      "Y6DLfgSi2q130S9NyhZIjH67/Ljh0y6UqzE9l9LkHYcuuN3Veq6eOnKW96ypkVU9EJMfJVXp" +
      "LysLUg0orrbs9w0gEY32J3rld8S6VRAYQTHynWKsenap9C00kons7pCunA72Y2mv0oeQne6I" +
      "Wz+gYe6ChJXF4l5aoqtY85GSWVbg9m9mHuN3oFpV8z2b2YgWgZ2cHVVRzeHuQcC9h0ymYG6G" +
      "g5XxPKgudlGy+sba8XvCdsAQ/VIUipy8mjcPqpHZyfuL+LYXtsv2aS7l+aseJLsV6b6bLmVs" +
      "r6tAgHpvpsvqvtpyO23a6CpKzN6l+g26wb+KbpzgPuqW6qgROqPL54FanE1HFITElLJQiiNq" +
      "fG4e58EZrhXxyHkUJ9GQkx71tNfvh2RRykrLFyYraLaLWWWraLmxOtototototpP9J9fl8Zp" +
      "wZnygi4JckG4oTXtF/a8g2p+C8SqDp6Jr7YSjSXFRQLJudBuu3cTG2WrxG2/t08HOHAEGBpw" +
      "jE9nALuq9VzXb+IdMulJvG5rxEYnKOoPaOmXSpNzBEy5Ov/34TmEtVNeEY/ZQ7QbKVhnhI+B" +
      "5Easrr+CQbkoaaaaaYVcleWWWYaaaaaYWWWYaaCmVxSEmPlJ15zv/WrykVHZnk0Q6n+UZlEW" +
      "ELPmTPieXUmpdLuxB0mjr5wtE4qPc/AbSWxTeg98Nd3f7s+2lZNsm0xOwvBuMctMbTIsGoVf" +
      "58BVaYa9yPPSbPGAzCbd/9MJtJdJ8JtJ1xbbIZpdxpUf2b3fN1j128AQHvHb/b8X6X6X6cgp" +
      "dv9vxfpf1v9P0wCchrLuRE4DoA5/MRY60+Tdvtr4cYO4nSXHaPZAeJdJd2Dx0l0l0l0l0ppF" +
      "X7MvVOUnEnATEbMU8bXvScScBTxUCchWWSkrH7xV87nScHlYodEiGNASM/k4qLHZMwfqMCMC" +
      "KqPKMCQjZowIwIwIwIwSSGQJEFLGEiOrg1hGv2+evmATrLqAbJba6TY0bxugy3XNikjHQZbs" +
      "PvnMUeOtNsVw5lCF5iFNzQuF2NFMVZk+SiThURH9Bnnsg8QlRSkbIBeOS9fgZWlD6a8cdh53" +
      "rFiDkRaPMF95KCuR0AGEwRz+iPrpB3b6qAmOEWVRa/VQvBRi/9hHAN0P++yw2WRV3LWKkyLo" +
      "ucqPNNPtnZ3c05nr+kD1lTFM0Y/0bwlO+PW1pHPCkTJfDNXDOjGQRB8NYOGeDd3y8mFd0poq" +
      "V7sQc5rL61TU+3yNEeFxuf7pxZ72B7B+SSIm+8lBV3o1ejBlzFSTqLOXWHIWKbvJ9SFp71lS" +
      "NTr25hZonGGaRX9IHrKlXDebcn/B4kIERj9YMfGLg+F4vb9hy2vADEf2Tr8G9lyohdQFlzSX" +
      "rHG+C1S3M0l1HwlIZFrJjEqjc0X2rzQdXReRGb7fi7ru/pt6uQgI39HsZgRGKburKLtJi4iM" +
      "TnvL6UTXdr+L5F20zYJoPB5llavCn/ixiP8r83yLtpkvpeDhx3TuebCXCO4F4+EIV2iUbulH" +
      "J287/7+m3uIsxaL7V5qWy4HNuH5zR4Gr9a7OMyscMSGjNS29bzuKRjk6VGB+E5abjISnEROY" +
      "Tl9RRWh6E+qBN2tz1B9R1+idl8/vNTVu+ZNWkT33UeUesWkesW8W8Wkenp8rfmm9qCTsrKeq" +
      "+G+qOtqb7+Is6GrW8JqRidwioIoakmpMx61GfiBWhpR1q7icSnD3cXh13ErkLysg13/rV5R/" +
      "VI1WayVzaABlmBh05Ek12PRhoiojO3BxkoF3EZeLpPwR5RtUtnlCCRNaqI4OTTbqZ/046Cen" +
      "DpZQYY4Ko9HuIYH7E67M1w5AxTLjPVGnXbPKED/XGHOjMms/ammgADBe6tM57VMor/G9uzS/" +
      "dkkvMW0NCmhFNLrBE1EeCArgFG7rJOTgQcdFtWDkbK6EWt/FoA6AvC5j2Y9/r6OAApdVmCpA" +
      "wMSLDv1P1CrM9aw7Eh6/U/ULDrEfVOARnfON7Pj6+IjPxCyyttuN+Y/ffUE6PQnmH/KcN/9l" +
      "eLb7gGrzkLQnonmZmtsakd4ICeieZqRqaeqDD5m1GA2UcuQuvfhQov1HhfvUve5EI9oLzt/a" +
      "w6w6rM9aw7DtprDrDrDrDrEQrh2E+WSezAsgd3nNWdtLN9hUX71UM5vLkUuII+qXJuZpfVqX" +
      "abO/DwzrPy/rpOCnmMgHS98y0I7WqIa+cf+pp3upZRMxRmSJ343UiCwI02M3XfrVcZFvWb7o" +
      "aaG4IVu6lIhmH6DRjgj7GEMYPuPsPuPyPzi/JTYQXLMAGuxYvvrir0xHaYT5gRicj+7EYx0G" +
      "XOP1eesUZ0YUN/FINFuJiCKC5czEQkx8oF5sWGJDReXMHd1ULwYs1SXUG64cRWIJuJRUWvXO" +
      "pN/iCury6F88zp+qEAhRIPXe+ocev/fbQ5LkWPIx0BRbS9ZORY7SpJtnmSTi99ZiZj8201mK" +
      "fuA+EX78NbPNN7UAvw4y3vWVGW2Wid/R7ChAVc1cRkBOYT/s0l1heP+38nBTsxyz53CXxyTw" +
      "yluZBnssA22tID1CFATAfoooNU4vhqvNcnrIat+myDUv6DWz7omAg4b8UVbmmPsJEVBW99yq" +
      "fteW6zJP/hBwexyUWjvAb5Jb6D+fkaqjGwqY9q0ikTHlBIracg0IMzD7sBwNClhHNbKk+u04" +
      "RhF5zveL76g943wbA8pvGKEep33d9h8GD1F94Qug6cbK9hdJt8opwHwi/a5gW+4v4v5cJRN3" +
      "Wsx0cHVNO2aysD+1typZFc0wCb2uI8p1qFc4ROqV5jPwOfi4OaG0aOk0UTuW6RXwYuU4mCWN" +
      "FULz0r0VShlxnnWYL/NN7UAF9tsLh11W1Brx0y6UhmPT5Kj0e2gYvBiQ0XoNLTmyI2g0ccHc" +
      "ws0VagsjOuPskXvLonOyRbH3FfqrEDF85zY6Xy5FjyH/310Yrn9/KKypuK2hndIJ5D12AAGC" +
      "4+9BkGdudvx4Ap2qfQIrgpJUej3AUFrV8bMXONbHAfCL+wkeQpOvj7f1g+uCqBmiSEf66D43" +
      "/Sp7IGL1p2DaG9yqsQMVhePPWbL3lzO8ygBiQ0Xq3sTH0E8PVXGavIjN9olq6U3dWUDeXK0S" +
      "sKC1LINPhAFHtjSA+tUjoU0G9Gxt+vmXcPZURE8fClJQUKevUEyaaRk4iPBTLkgYXZwornjH" +
      "B6xBT3tW34ldbzbMggpWjLtt4o8O6qF4KJWVqGJDReovqJLS5N7JoG5PVfDExX4HugoSR4db" +
      "LyIzfZqFlz5ZJ5pNlMgdBZrkXSdN3LneopcAPLb9ZR4TtgB4VV+ei7xO2AHff6qU+lmrr3sY" +
      "DRre9ZUgMzD8vaL3doZIfQTxMDDVreoR9uAuAU1I5FAFlnO4C4BUAUB4Cgx8fLe9ZUehzdxM" +
      "bZd+ZSUzpY5Z0vYb10ppxdaB0V8AUSm3W78XvZMtjOxctzIkWxOz1F6ep+CV2HDZBeFdx/9U" +
      "vmB+iZkmgTJVLVS6+sKBJJjhWTBYK2Gef/l/lUiHm0011Av+X+VTTTV+Yydq7cx3iOPEEen+" +
      "KzEC1e4bQgxzg2mRZWcbnz8BFPkbuvCkYe0TVOUnEnATEbMU8bXvScScBTxUCch24X/WaU55" +
      "OjzZlE1KE5aa8IxpxX6Ohpz6GEv9AtAs9xu9AtKU10C0C0C0C0DHDe68Uy4zbHY6aXQQqidp" +
      "aY2OCeEJt1vBZ+bTrYzsW48iUWIX0Yzq3syDoUHH+eoJVQTfx9ji0trwBMkJmZ0QPzSxOKhP" +
      "AHHsNmnF1matPI7oPJX7ZDVGVGU5o/VGVwDlUZUZUZUZUaj5Bfeab2n5TrJq+oqtZXEE/CGe" +
      "Zda9a9W6Xda9oRR1r1r1r1r1sOxZt+auIx9m+ViWxTd17YvlfUVWGwlZF1xY3EAz0wk1JT1X" +
      "w1nRdO9WfAfm3Eqz5tE5+keALvnRO0TwklgG8mxMWVR8uMx7i+4mbAsjy4wDcPO9s7osuNBB" +
      "VDLv3OhE9p3CjKsSgNZBitMC+oudga/zDdFaiTNqzfkdA9rpUMNiBHMd6P/JbdEUdLsiUneG" +
      "uzR/EbNuPRlZ14aKfldxdxdJ3Vdxfzr13F3F3F3F3JpZp6gt6yoXxdlU6CnL2FHX3anzCWHA" +
      "RIECBQ5j58+fc6RIzQEczzPTxdbXZ3g2utrrsp6WykOREj1M2T9ozUcUcMNErlCKI2B7vdhQ" +
      "rzNuT+VEiDYAAYK11nWv6QPU8BUbvAzbT2X3l5kk4uzDmruq9Vwftrjh+cKSR5Cmn2XZ2dwX" +
      "WsX/+/ptyJEB1IHEZvpdUUXIPerJcabdpNfcP1a/SyDO3OwSvXtJGJyO3s4Qs0u5J1I5/da7" +
      "NQuQ6nwgCizijljMWySEs8ln5sJec/UMxT6mTtgB80RJ6gOUGKH7PY/Yhk/egTQNU/Q3fcY4" +
      "qVpab4lx0y6UgU7aU+EAUX7fuIX2fs450dt+a2JwEzKv6QPVodS0lGZNYvb5pKMybSKDypq5" +
      "Kv2XeZ3hhkg2/79+QKlkT3P0iK2VTgKfC1clx+GWQ0p0vwk2/7P/j8k+X0NfeOCBschfZ+zz" +
      "wb0IQssU+eowQhZYqAvqYhCyxUgtm1fGzFv58Dijx1mV8+3RpvyrowWdgABhFgGqEXpL5Lzi" +
      "zgkAeu6Mq9kqcmzMHXhVscM/gMGgp6jIjxfHgIySws6WUa2WUsiTiUWxhwpX/2PyQm0JjFD2" +
      "LOQw2IB4IDE2eUIH5C7ilhZ07bPJGy5XSWyjYp+hdP5QcRqEbXUF1A7bC6pNhXMWVK1WmnF3" +
      "X/Q72F0cSsSsSR2i7CCCCcSsSsSSCCCcSlm6EVfUVVnw9GDGiVUmBKuRUG0RkLKqyh74z47c" +
      "j363VNYIrvXNbc/dUu5VFGFX45poZ3Sgddqz5ErsvQ6GvKyfphiuGChEn7J++sjxsujBdznz" +
      "on8PLGjNRa7Grj/rsaUKUbsaUW0QBYj/RzRqmjo+7ZMT8z/Z0byI3GhK14fSCeN77uNgnvoW" +
      "gf7X5JTZTqgomSxxZ+KWWrGM1yUumpwia0IA5TZptBW+wo0GE3YfJ2x/0XOBgT1uwO5BI/T2" +
      "aGGKvGelnk/uaSl4ONAxpL250pfFnLl4heGeve4ueIb2Kp19fR2WNstEmBilu6IbWZ7ZorOT" +
      "5D1PmW8MPC4AElfDDELpQ8usI0eXw1y/XaGd0gSKHUOjfCE37g+NHl8H70b/zHJndfw5xv4X" +
      "64hD94CEMDeASFKFN8MFN8P8P8MFMzft47qvVcKSwfFBzKZQR8/JRHOSuij4yzAkTF/s12Mw" +
      "LMDQubuHuFvWtLXy+UdNHQDRmaaHTZM5uXzKPsLRoaaMQuMlHC4cbElLLwkiNge9Rf7UdijO" +
      "jChv4pBotxMQRQTSJucT06gMn6MV0iEgtYHZxL8RVvt+/ZeQshBP83nYunvg2N3A6tPMe2UN" +
      "6quKpH5iqGYP8XC1XfChKviufrcqYCHNSPp1IAjoxJ3pwXXwh0cQsv+RaN9gGbheY5kiiMt4" +
      "6Uxdgg1W1RSzJbVbJbVjVlNWG+olcBvhas1fZ+RqpzCrDuUHNnZ3ArqTNkRtENFtpG8ZgdtJ" +
      "3ZR/MmyVK7+RT5wJXD0utnschhsQDaREjZBy+KRe1sd7syHgh0u0i7yo+LpWgqmrem4Dt2Nh" +
      "xkubelTJ2EwOTxB/aluKY2+mL/TXNtGFg+X0bHMuOIPlvpD31EgoiNoK01WrIOXwreiZXdV6" +
      "rhU5HhSdfHDt2LYhCyxPmi1hgQHzQ4VyuD4XidE6wp0FOeWTGUgEytJecWV3qxfOMXEQlmOk" +
      "ZUl90kN/5EkMZFr4uY5Z3ahpxU6CnLzcaFvF99FBThnRpvyrLQNnE9OnrFPcVw2FAYc34xTL" +
      "jPN8+B1fGzFr6VjFMuM/zo+SSFzXYJNRtWXjVPBegXTO80AINnWQ7xGoX7YO3so2zp9S3irs" +
      "9GXbjuhyBltUSqsPJ15ApaXJvWe1Wo4Buh8IpFcws0TW2mYQvs/Z6GpLYAAYLgcTWOWRuCWG" +
      "kZ9BPD0QRlzo3wh6nHTy4kBwBs1XDSLNGgRb6RN52PcBUfXW3+BwUX3f2GKdmfXIkxBSxgaQ" +
      "UC4D4RfyKCQFEYbDux1XFHjrMyrTLI6D70iK1qdqn0CMhKz2qZNPLhI8yScdLDQ0FW7XOFYy" +
      "BKQwvIcQW7vMNf0PXmnc84q36lQgaEeClQK4nqdBTmAztCs/NhH6kvU2LWTYq9Mfpn3hknkm" +
      "4jPoY2Z4E2SeSbjZjcSdnVry0U+bSKW/4EIWWUA6+R2kNkoyg5oNRtm6xkjKkOQNDSje7fxO" +
      "JY5xcM4dgNwNPK2JN3XBfHHEs+KIeFT4wD/7S/7kcIfNrRvvexE3fw7PJUdTRz/3SWD/wHT7" +
      "syQ/dLntAkSU6PlAUiQZlQnRpaHam1ijx1rg3CyOVbZ5NmAZfH6lBE9w/vgsXJJHUyOR+Plz" +
      "SbQRnnBxGvhZsMzAsy6VM9ICOZUIDx6GGhVYxewpeMichrTaE2OgJcDjxJ0tHfhJ/lX+EncX" +
      "cuEncn6W9+CNHl8Pt5fE7+j1"),
    AvifFx(33, 21, 8,
      "AAAAIGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZk1BMUIAAADybWV0YQAAAAAAAAAoaGRscgAA" +
      "AAAAAAAAcGljdAAAAAAAAAAAAAAAAGxpYmF2aWYAAAAADnBpdG0AAAAAAAEAAAAeaWxvYwAA" +
      "AABEAAABAAEAAAABAAABGgAAA2MAAAAoaWluZgAAAAAAAQAAABppbmZlAgAAAAABAABhdjAx" +
      "Q29sb3IAAAAAamlwcnAAAABLaXBjbwAAABRpc3BlAAAAAAAAACEAAAAVAAAAEHBpeGkAAAAA" +
      "AwgICAAAAAxhdjFDgQAMAAAAABNjb2xybmNseAACAAIAAoAAAAAXaXBtYQAAAAAAAAABAAEE" +
      "AQKDBAAAA2ttZGF0EgAKBhgVIKMCEDLWBhAAAPFj6XbypyJRfTFmbG1VaJAWk6HkFaJXCzpP" +
      "IVSDuXu+PQ9HyNJp/VX8fRWJMJp//+6a7fd0QoZei5qBqfuaeOpWFADCThNsQDIJkJA3Q7s1" +
      "CRayCxenTRbexRJ8SbaXOL+LI+Or5gooJ6PHWN73PKpnO7zHbRgf4nAtR7x1MhnCOA2r/rN2" +
      "7dsEk1yMGZNYNY6OnKRBwvypI78AwTpUJEdJ5+8yp10QW094NsTJXcB0QSG4XF9w85+BuIbi" +
      "wdP/+wkDdfCqzwepgCrinininipXK/iOePiTiTiTiFU5LLYcT06fUbMdi/u4mNst8MhVEUnA" +
      "LIz10MqxZqO4UKFJp7z6egYwxnbncQ6RjE6U24fbOo4B3iAypdF0YNH7YLDgK3PxbxaRPfdR" +
      "5UIqfFvFpHlHrF03U/y/dTQleMOcHHXHT0VHXDTXganqdEdFR09FR2k4FZRoAEQgiuP8O5HC" +
      "jBHw/xECYj/D/D/D/D/NROds0Z86CzSL0x7r9sSsJ/V8srZjtdCRHu2FcQ3E3rXF9xgGBbZb" +
      "rDtpAmFT8g3IptxuQbkKey26AWw8IOWNZB8/WwwID6Hz4Neyas0o3O1GOBreNVlHCggJRyi4" +
      "wwcylKhOLjU9kDHZWBDWFoPvnOLjoh05uV6BU5NkfpEVDMNl3ybxffUFZ/////+rnydQJ9iV" +
      "iSO0XYQQVLi2JWJJBBBOJZyhNedo7ZyIb5nH6YAbn0HpvuTzG6BuhSHX4GVphHyLoqXl9xfc" +
      "TNigbhcYBuGUZAHZDLGQIVQbX8OURYa9Xt8+6QSHCfpQo3qxeI48RgF7khsiewqY4Um/V3aL" +
      "w8evht69mXMUZSvWmuJE4E1Ecjws+XvqlQ/9s9Kkaya0qBih+twb3Eft+ylQnEwYhJANZJeC" +
      "sIAQNYnX/EytP////TW4wfHNvQP0RpzfwBhZBroclEac4ppJoc4ppMziSI8Iv2gfQVoatCes" +
      "VvuClHiISy7I727cVGiYTGu16kIxhZ3EyMv7iB1UMboTRJ5UVwX//8ZWoHMusvX9w1vPX9w1" +
      "vPX9w1w1w1w1w6g+f7Nx7qLxy342rvJ2Ux8sdSBqrCkyxYPnofMIUGfu+6+ouwzBg0VMOUun" +
      "c7KNO77WB9+omFyZ1m7o"),
    AvifFx(16, 16, 10,
      "AAAAIGZ0eXBhdmlmAAAAAGF2aWZtaWYxbWlhZk1BMUEAAADybWV0YQAAAAAAAAAoaGRscgAA" +
      "AAAAAAAAcGljdAAAAAAAAAAAAAAAAGxpYmF2aWYAAAAADnBpdG0AAAAAAAEAAAAeaWxvYwAA" +
      "AABEAAABAAEAAAABAAABGgAABucAAAAoaWluZgAAAAAAAQAAABppbmZlAgAAAAABAABhdjAx" +
      "Q29sb3IAAAAAamlwcnAAAABLaXBjbwAAABRpc3BlAAAAAAAAABAAAAAQAAAAEHBpeGkAAAAA" +
      "AwoKCgAAAAxhdjFDgSBAAAAAABNjb2xybmNseAACAAIAAoAAAAAXaXBtYQAAAAAAAAABAAEE" +
      "AQKDBAAABu9tZGF0EgAKBTgM/9ikMtsNEAAAxQD12Sd+TvYgF2ng7uI7p1X8kXOEZtnf4Ijl" +
      "///64S0lVOFDLoPuw0af7/f778pH/k/Pf7v8jXDPWX+7/Jf7v8jjHHY3+7/Jf778t/vvy3++" +
      "/Lf7v8l/wCKf/8fdVoBcVxkd6zBmuxXVWLFdVYsV0yyJuyhZFdMskV0yyKRt4jFdVYsV1Vix" +
      "XTLJFdMskV1VixXVY6hjTFiDj44qY9FqHQ5s54Bs+O2Zs+O2ZVB1qxs+Vqhi8IYbPkS9z674" +
      "b0b///BSRJjkq7zyO9XAVHzp3j56AS6ZR9aDP/+e3qBhwVmjIH2i2NiAKXz5Qe9KY+zQU1Qf" +
      "CMdQe9KZAEFdFQe9KZQfGfcsLJ/4YeLRmaQb0F/59+xh5/P89e8DMv+Z7a9e/5O9e8DMw8Jz" +
      "i9e8DM9e/++hE0ftJyn1SpTiA3zV+U8Lg/af38ZKRv////9SQK38pchd3IjYYKPFfsOKoUhL" +
      "1bHsOFGRjIFLLDhRksOFGRor30bDhRksOKoWw4qhbDiqFsOFGSw49tL///8eIoLuhMHis7Ua" +
      "I+curXJy6tcnLq1yQGbFZy6tcnLq1yRAJ9hy6tcnLq1ycurXJy6tcnLq1ycuyGZ///nuY7Kj" +
      "M/8l/ZCZPzE3OZMTc5kxNzmRuUzLMTc5kxNzmR0gZsMTc5kxNzmTE3OZMTc5kxNzmTE3lMgd" +
      "XLV30cc7bhItLV7EVrgjW3314AJ+v/yMMji8+kZVvtKS35wa2MnBrYycGtjI/AGlnBrYycGt" +
      "jJCiA2HBrYycGtjJwa2MnBrYycGtjJwa60Vcc9XiMPyQ1ywxJrFrrFxX0f8LN+5lWHEeO8Ev" +
      "10oHurMm85yTcM8ZEr+3Ujw/m1HqjBcH+bfwfIwroHkGXfmWehonaAwPC4E/W45UhrVKYVmn" +
      "jOIDfNX5TwuD9p/fxqbp//xxCeJrjiQvetv3uAXWdpzcNHBM44c3DOKX9fy3zGG/zGHbn//6" +
      "waIwLcZT1JViintTAL9bL5ir0iJuu+YVY2fbrxsxsxrbtC4/8i3Fduiw3J6+1akFLJkpktkX" +
      "jtKCZLZF00M/mSmSmSmSmTE+z+dzH3jN5reQjWhZzyhYhYgxlngLeIEMZA7IWFiFgh/iBFjc" +
      "3PYUeUajeNaZ3q0FKbQkNjAOsy3OhwoDrMhQYa8AqA8BcBcByDnegZ8g0rm8fF5kIdXHQMKz" +
      "oxQXy5Y94S6VxUQVEAlrPxTZJYcDm3PerVa5Xs3nhad1vH4n6e4j34ldhklc8eBQQwr6S59Z" +
      "BuPoiaS59ZFJUAskufWSS59ZFbw2wkuj8WS59ZJLo/Fkuj8WS6PxZLoXbkJPZkRyZhdYElqz" +
      "942cr39PH5Eqi+8vaPGuCulA91Zk3nOSbhnjIkDISdnfB/fLrIbo7mVr/WY53g2+hhoSZcIF" +
      "5hhme9edHKPM1388O7G1tbyq6HGB+ayIMblWHqfsxu+wHWuTgGEKtWwQGeSfxZj0Bl3ymKY9" +
      "LBLBK6ZDNA0I7rxZONQA4KzeqVMONpnw0yiX5nP6NMcbk4T+kfEfEeT/Spsbw1OeHm4MUmVe" +
      "amUE9k9piYEuURPaYl8eWDT2T2T2T2T2gj+g6gkjRFXenDh64jO/dTVDfRDgN9PwDt68IkNM" +
      "uHjxq0XBg02Lw1kbzf82LonZZrT2lDE2+awV9Ezw6gkgriUD3QVNT3mlhiYVNEbojSKPLPSO" +
      "zIy1SQ7sGx/Wjz27mCEL5HQ/+qm9XbSp9L2wM2XNqx/Ck5CzGwh9sNrCzD7y9JZoqyglYoo7" +
      "ONrkpXrWIGvriTlX4P7NmCXD2pu6AuiYd9ZbFzuRHWvi1DSqcntbsyWoK0a9dhbubX6n5I5R" +
      "9/cuen4z5F4Xitp+SOWn4z5GNdCxp+M+Sn4z5Kfkjlp+M+Sn5I5afl17yScdF97LpgcpWaGV" +
      "YH+H+fJko8TB/nyYyY4sf4f4f4f4f7Zt4vyb1AJDwxnsMsW7bcLIttwsi22/7IzPjFltv+yW" +
      "2/7I2HeSNtwsi23CyLbb/sltv+yW3CyLbcWZIDrEy7J8wHv6w0rOwnX4LCdfgsJ1cyJT6ZZC" +
      "dXMkJ1cyJ1VSjCdfgsJ1+CwnVzJCdXMkJ1+CwnZ7Eji/b7/Coen362H4dtvubVdkK06RJubV" +
      "dkgVzizm1XZObVdkiJxbDm10RebVdk5tdEXm10RebXRF5taiOk+wD/sETvQ5RFcH1sOoWW3o" +
      "ONcnufCy7Pqt7giVbN2IwaBf1f7D5kSmlrVf7Z51f7D5kYHrsFf7Z51f7s51dSWEPdQFMDuy" +
      "gGw85ei+mPh1Md1yiamPkOOmPh1MecKNgmPkOOmPjVRFnyiGdoE3jnuGtx/iXRw3fzjO")
  )
}
