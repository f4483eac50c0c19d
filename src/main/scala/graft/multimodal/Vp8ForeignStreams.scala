package graft.multimodal

/** Foreign lossy-VP8 conformance streams for the q211 oracle: three
  * WebP containers produced by an INDEPENDENT encoder (libwebp),
  * carried with the reference decoder's expected Y/U/V plane MD5s
  * and Y-plane sum (computed from that decoder's output, NOT from
  * this repo's). The q-entry decodes each stream executor-side with
  * [[Vp8Codec.decodeVp8Frame]] and compares reconstruction planes
  * bit-for-bit via the MD5s — the DuckDB oracle pins the expected
  * constants, so any drift in the RFC 6386 tables
  * ([[Vp8DefaultProbs]]), token decode, prediction, or loop filter
  * breaks the hash match. Vp8Spec holds the full-plane fixture
  * (per-pixel compare); these rows put the same contract under the
  * row-level oracle at sf scale.
  */
object Vp8ForeignStreams {
  final case class ForeignFx(w: Int, h: Int, webpB64: String,
      ySum: Long, yMd5: String, uMd5: String, vMd5: String)

  val all: IndexedSeq[ForeignFx] = IndexedSeq(
    ForeignFx(64, 48,
      "UklGRlQDAABXRUJQVlA4IEgDAAAQFACdASpAADAAPpE6mUkloyI/sBVZW/ASCWwBBAH4ATxl" +
      "COrvc/MEqb9q/Am0IkCr5+rP8u+hLuH/2A9er0S+gB/p/8d6x3+m9gD0APKQ/8P+p+Df9kP2" +
      "19nj1AMoE2ffi/A3xOd1PYr8fNLL2gPsAwx3aT3sPsB5yn8Zz2i2KBc8ywBKYNqaZDEhkd/B" +
      "gbnqay5t+VL5PfT1rUYZvj/NzQnhs8e+SuFwAP7zuvzX/67m/46/7nj9SP/9dezBCucTbWdM" +
      "ZKOctpjAH/S316tmlGp8VW9f/+oz3X/8/Hx4/x1/xlGerH/+vyINhkUHHn/N0lyNocdpM7XW" +
      "cCOqVxonx0zXCsdbt4dshYFJSbHCjEeNmn8FeY9nMf/eUtd2PS85UbSnpqWU/tfH/fu+MrAc" +
      "F6Hq59XQVlkoeeLWpwFs+qXxgxceHgGBgdb2PHd6Qrmf/+bmH/Zt3qgZ9JXTQF5hMyFbuEAg" +
      "iwzAYXpUwMqDuDxvQ0sjrzkMuTkUhZlVAwkMhxp1DTjdSGToykE1+o39C65FsXpoAUpzNiSr" +
      "2aVjKm0Hq8cnD+FA9K9Ue4ywh4CRIgAghvvp/kOqcEH96y4o+4pf34bsLSiFDyREVMCy5bVi" +
      "RFw6a5EHIi90hVp7QGVP1xJGUPv0WQEEFMrJQ5VrmZOQ9htlGz8PQ5lNiaGTxkYaj1kbW0GQ" +
      "4PSk/UjGJuDFF3S2zMkRm/GenBw/ylIKEyR7osLxjLMhOek0l7CzedulULge/ctg29h/jNE3" +
      "Q5UTO72FgxkZSftac/GTtQD/fEmYVnfaRu5lNdxDFF/5yzHLqxX4QxA6Oo+JfqGMpl/EpWO9" +
      "3k1PlUfFiC4exvBg/M1i6vG+HR13TyRkW3vGxddKvVW5QO++J4zhnfNOjXWHfvbHX+Fm3Nus" +
      "yLQcCPe8YBicUBIJbdfeSVzT9twZ2Jf5VsQ4srlaHXRWP4r//sMHT6UL7oXW7NDvwP5vsDy0" +
      "eRuBf4LB3j8tM9GHa41ab7AlX+OA5U/rqlJBA4vU3TKDZgmBo9R6Er8BXHc8p8q1AdPPtDSU" +
      "6ijklvSKT2XwkZzGEfBu+3FONB2D5PrCUj2LUb396DPjC9YAxji7Rr/jVZ0kkyiwAAA=",
      389209L, "6df7c794835aa6bb7d1a7d87a7ad79f5",
      "82f154be59ab716aacd75999eb058b47", "ee4cdfd4d5a8a54e1538d13f19febbc0"),
    ForeignFx(48, 40,
      "UklGRg4CAABXRUJQVlA4IAICAABQDQCdASowACgAPu1yslQppqS/o4kD8B2JbAEGAf4D8QJ4" +
      "yhHhMiKrv2/X2SWQ3cLA6QD/5ei36gHPW/tJ8FP99/3n7K+0BS/3vX5K5/XoAPsax/7YBN6f" +
      "0A6LA/K8X28l7zphlbpXxl4FikNLac514PwAAP7mXxKxVD4aTeqK6pjzADoKv9H9G2IJIJ5B" +
      "HEo2f1Nl/Znc1/h//ib60nSZIMTxWsCdv87v7Z67Ei6ux5AEX8crn/ietPrmtx3iBlAou989" +
      "odjXuJQyxi8bVr1QInvYxf+BecpxHStcff38YiJ5cAdnzuFDt9NlwOuLOaust/9lZNM5wYGx" +
      "JH3XWnPBXZ1PrC8Rkps0eWpMEJaXn+NnrrZQHD5s10eSd5TNaoCurzxcDzHPksK7zxSvzbKq" +
      "I4EuA45v7J3w9P3w5BrBCwHPQe18qV4xu9QWS8ZU0J20oxGX5dLIyrrVooCsJuX74NUJIThl" +
      "fGNmA0cvKuJGn4XlWky94yzm47J4Mz0BNxxaZXRT8+6DZs02tIl9fZBhUnHzqYXoEyJnU0Wy" +
      "1LGkNLGpsNgQArlGKFMF7wM+FkhMzKqUbJ79WBtnxlwGQ/MKgGaepC5r3Yrl4ytQBznHIMXt" +
      "bFqo88KIMYlVK1SesAaFn4sQQ9TTWOY/m/mgXUFlFLJSqlj3y6rCE3hsj9bmJAAA",
      239542L, "9fda5c94b008fddfb072333ba81ec3f3",
      "d9da559930c9912ba779001033a360cf", "70bfe3dd8703f6cdfded0dc6a9d6c6a3"),
    ForeignFx(33, 21,
      "UklGRloCAABXRUJQVlA4IE4CAADwEQCdASohABUAPjEWiUMiISEStmQgAwS2AE6ZQjwnyv8T" +
      "fYEon8c+2f7gbgiU3qS/R/kB7K/4B+AHyA/AH+A9TD+x7pv9Iv9j/Hffp6QD+x/0D1e/9J1g" +
      "H6Qein/hf7d8E/6q/sz7Kt24/Vfwg6rXsr6ifuNUmO8xnC9Zg/AD1QtN862Doww1mOWsmaCY" +
      "IlAn22VwMcEpIAD+/yCzwLWcAN3Osm+ZEYFsSD4khl1bo1lbX0I3YwM2Fq5wi39v9tiO97tt" +
      "eUdzwkev6e+/8Xv+EbA/X0Somaq+LMxDmNpOLI2ukoM/R0xxrcehPh1+9yMkCu/60Jb9w6N3" +
      "4XcN9i6fJlJeSf/8Db5/fedNUdIMz8IX7//xd+Mr2TZVh2FkC2hD/BjQm8RY4Ty16S3aflwg" +
      "H7uKp6b42JSiwB+/lqeS0mEgk10j8KHRiAgLPy8xX1tvsjIhmWahB6TsJ4RN1Chz0P4Ekb5V" +
      "ojPkqiN8I4sBsBr/+7HPZqGZh1b0qu0pT5qj392OezSNwy0NPBLKt+DFyppv+fYRv21vRnue" +
      "/6Wm53l0HoPueXxZV+ouNJ+RBpvxzfOKYmgKVUnkMVH7FHrqvU3bQQon/0xv/+tEg62rpFPl" +
      "/9y/uyEf+xWPQleFWpvX//N2y/7C7CXGFqUF4xQ1f++9dPgUsmcaBp3X37eIWet/6oTq20+Z" +
      "9tal8q/knwIzDzsd607aB74hxesl4LfpBVf+L30jsNpL8Sv/8tUsrjBQvjV/DCK/cRsNbi3j" +
      "OHNnCcYtuqVIkoTJNuAAAA==",
      86359L, "80e08bc3ea7e9b15b6896375f35b208c",
      "b2732fae0080fd25aea00192470a19ba", "ea7919ea74021487b8e578467d956c75")
  )

  /** Foreign LOSSLESS (VP8L) conformance streams — the second half of
    * the WebP story: independent-encoder lossless output exercises
    * the predictor/color/subtract-green transforms, meta prefix
    * groups, color cache, LZ77 and normal (code-length-coded) prefix
    * codes — including the kCodeLengthCodeOrder placement of the
    * repeat-previous symbol that only foreign streams can catch
    * (self-consistent encoders mask it). Lossless decode is
    * bit-exact RGB, so each fixture carries the source RGB's sum and
    * MD5 (the encode input IS the expected decode output).
    */
  final case class LosslessFx(w: Int, h: Int, webpB64: String,
      rgbSum: Long, rgbMd5: String)

  val lossless: IndexedSeq[LosslessFx] = IndexedSeq(
    LosslessFx(64, 48,
      "UklGRs4EAABXRUJQVlA4TMIEAAAvP8ALAE2ISRP22z+0CSL6n7oXZtq2MYSeO8sf3TQIQ6Go" +
      "kaSoBHD0iyAC/8oQwKiNJEe1OV2CEPmjOQSnATDa175W/U9lLfKqwjmEn49Q0bk+b4EMX/0I" +
      "Lx+DlxOPGoI+nYEuASADMFn0A0BNALKHjrZtyx7lmf9PgsNohWvLX45blZJd0LKUWQ7u7u7u" +
      "7hL3ZP583wbOCvuKr8JhXBYwpMoiHnwBaTncISngWNueWHkn+XMv7u7uVjkd+2BLrAP2QOdU" +
      "7lC6uyT5Z+DItm3amucWv23bjGy25vft/8i2zch4ti+CgdtGiqZ70MHlRxxtS0PIfMI4MnOt" +
      "6c/M55w/Mx/Qz8w8urgkHJkdImfmCpeXmc+rPzOPLivJzMvLbnN3riA3M0+uqM7MJ7wjMweE" +
      "ELmqnhNvVYWTOz2TBAAEAgAAAhsAAELp9KI9qQCFDKbrn8lSGk7T8sx8TnyZebY9QB9JrKzs" +
      "Qp8ma67mFl1GQ48m8T1WxQGVLlSce3eALlGxUsbRl8Wov5wkSsPCuJSq/mlcygyrb1xdQmt6" +
      "WvxiMblo2X5cvLOFm8/vcGajHzd/gVYmcLMBLwc/bn69wsaycrQK87BlBbR6JXQiABGQJZEu" +
      "ADAXBqWgEwCISBRSivrU3k70+WpczQm6/krst3piBF0i4+x30IeEgwFdGVhZNYA+DFz55UAf" +
      "oHsadImFDzClMhKKV78tkAAgAlFE4WSHwKqVioOMjI6cip5cHANi4J+wMPBvVBwsOv5Bj4vj" +
      "QxwcdLUOlTGAgQ5k9Pg4BtSg2kFgBuVb9YmM3SUlAsyajUxkoWoAfhJIJezhR4+vMaQudG+y" +
      "jQayoMmFSxtoSKISn6zsGsCQGjjY6/gdZ0+sqA1hYHP5DBZw9e4JGiJTvQ3YSsVaKeQnQSUA" +
      "ImVeQfgAAFBtQ4W5/QXt+/ULvbh504+XP/24+eQKGyfVQKM10I0tywFxh9Zgv2/dfHqDVn8T" +
      "FpfkotXfj4tPt3DzzR3OWlzEzUdX6MSe5hGLAN9OO1F7BADCY77gfVtto9rKXpyLIqalfvrq" +
      "Dw0DVo4N1AzhxaU7z4I3Q1DTPZ+JBh3o8aWCijAMlYCrj09UGoD1/ROYwdlrK9g2NfnJ1vMA" +
      "zEYBRZEqcJZ8bwOANm7DWbu1h+Pam3BkZREuuj7H0lw+1teO4dWgBIKbowMvEsdil4tXgxov" +
      "cIZrE6W2F70Xl9/t4UiXjVbai6XkU0/zVcg5+gCmvfeqbQglrGj73i6uhdr7AQBQP7J/goYo" +
      "6G5YwFBq4NbnKxwQvFvpEmgkGTjY6jggqHXD3Qr/NkwG8+ure9EQGffGEwxlxtZJAYnMRTFt" +
      "J3ob/QAAWAQYAHQA7oJCzt2neASgBmAGP4AKvB0CgwBAfVx7EQ6ryMRTN8tY7PKxuHYML4cg" +
      "bn57xmP+CYtz4OUo4bCmErz8X4xHX/biXfC8zU5a0osjJb8MNQs1kTLfXqLC7u2fBOlTXKrq" +
      "HUrCbBQCePbKiQ4HVlYNYAbDjzuYqTi1YQFDCehRmW0NEmzrePap9Sfg2JoyDCWtzL/lV8gZ" +
      "qh04pBAA7MAQAAALQYKFwIMZnARAROID5najPfWPgeB0mPZiNrFqDlOyRDU/CSRz+wE=",
      1219298L, "a0468f6e39ff7f33e3065e2d528e98ba"),
    LosslessFx(48, 40,
      "UklGRugDAABXRUJQVlA4TNsDAAAvL8AJAE2ISRP227+zDSL6n3oLRpEkKSoJS08q/+qWDqSw" +
      "aSTJUUEYXWwhHH9YF91bsW0kSdEc360uCMw/JjTh13q7/0GIcA1zmPITzLeDq8RqbCIpzC74" +
      "H5Egf3V1Xw90EbHU/SMAgJbW0HW1bZHkvEPVvbuGjsyMGbMjR9aEc6kTbmRmZg6Zl2Eoaqiq" +
      "K3iSV2/mUZlrzI68kRl/yYJkW3va5v2yReHSnJk20FG30x12AzjkjjItM0n+I8O1bdvYs/b5" +
      "/9i2bVSu8ip5wL9Pazulbfv+94TCtm2buFNAk+4jrjcDsshKjuP2t/Tda2+3femO8tt35cJ5" +
      "SlcGPXWlf/X+SDYplyGbsauX/8PfPxwqX6XvBr3MvnTnDKv7ruwKWaUrVWLCaEXKCQkw+KPv" +
      "ynH7V7oe4QjhNPWklIxs3Jm0tqSi137Pu74ctb+l75b3R4PnUczt5xmYH01u2ps22QLC0GUS" +
      "/xi8934+ZgthdiaMljSOj9q/9jBhZ8I09dNacf58l0Ulo7k+0R4ZVi9SEuHRsDTm1ssszL6e" +
      "TJ5cuTPZ1/sijCgl3ievwSvnMzH74jumAgBQg35R5kRLxQBigoOViCJt4MkCC2sLv3O36wjm" +
      "6wzim/bGRD3e0hDh3L0VMFu4yfJxu8k8EI7xJYi3CMEPruzGzJPEEx0RIqpMpMh4i50J9204" +
      "GCAHExNMlJzIYGJCbU+LxYGNDDA0AIsGYEP55lcWrYBjArABwLACWATgGAB/THc0xZOSUEV7" +
      "GACQIqP2sAkmyv5rA3z5dhZQeYC9913AGgbcdgCwpgY82CKAiggcmwD8BCw7gI8msEhn9hZJ" +
      "+aQh/guRYJbUAHI0wyKKwxpbpIJq1cMfjI+AfS8PwMohCGPffYTP79QuYIRDrho1ASNfCuwT" +
      "B0bFgdUqBXwLDPAp5/5XcCyuCA4iiPqgiSuoFh7AFEf8LD5igmnmqQKaqN5Tv2yzL2bt9xvn" +
      "0aOESRXN4RYL21TGgu+5fw1eU+kJM4QTTiUJk5vKmMMa36RWIeI2AMBfAZRhxp/4jWvszV+i" +
      "wAQT/5zPTf5WoDGeJwLPAQCYMEPvjUPMkR/hrMisyTtcOrz0vEp4v74LPjD6C8JOC1WYffoq" +
      "qp1TqlzhZPUNh9Osk2bDRPwEAKiPF1DM62jmLlY48Vl/pFgaZawJngMA4HwAAEAtHWqiRABc" +
      "sacIZy0bzsL9nMkHHoeTZicJl5HIth98XQ4etu+Yd/nFGUi20YeWv5C4bBtrqAH+P3UuGaX2" +
      "uRMj0mKjzmRUUFd46rsgC8jhfJzg4G+Cz0aY4PyFSAQHEwAA",
      778556L, "a8014f2ae8a949309a0cd785fb829c6e"),
    LosslessFx(33, 21,
      "UklGRuABAABXRUJQVlA4TNMBAAAvIAAFAE2ISRP227+yFSL6n5rFeAgEkhD2pxtFQdtGTm7+" +
      "fv7wDsHrIfQ/hFJ/Cirg0pkqMEyeQm5t26q2rN/d8j/7U3dCBtFfLjEFMAi1BTJ3dz7rYH7g" +
      "NrZtVVnf3ZASCBlC+o/ogBYkcle4tW2rVuZ3d3cHSvgZVdAnIR1ASE5mqUbPXyhs27ZRRpv9" +
      "x353U6actaqBx9FbORbKSjn2ZptyvBPgaVTCl0w55ov6+sUAMbb0tHFWVpgUG+fCxM7Tzedv" +
      "t1BVcF3eBYvKuLN6xmJcxo0+xmclLEf19YsB6oPJgv+TBRtnA65rNUrTcblYHpOHl9t/0r9/" +
      "eNWel/7LhZv3K7YNcfv5iG3d4KXfdaQk2ZREpvRWbBy3QQpJxO/IX33dRJ3RbCgkj4T5N5Xv" +
      "MCXFcdzz9VcKYbGo4cb4is+fQEZxN35JWZHP/wDX2X2wGNbxUbBOjJSkKXYT5UYFINHATf5J" +
      "rZciw1sCMHgTulIPYO2bJw9fPwmWwzqJPweB5Cl//cfBfCBlPgqC7xIsZ/Xh6SVI+sT73wMx" +
      "dxWlRgcAkFjmeigwpOXL20hWwO4DnUUZHC+2KYTDeSHY2T3hO8Gt6QOOg3Jw7/8dzP5r7fFR" +
      "AAA=",
      272195L, "e7a5583c89a942f847e4bf5beaa254c2")
  )
}
