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
}
