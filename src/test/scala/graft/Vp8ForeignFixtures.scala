package graft

/** Foreign lossy-VP8 conformance fixtures: three WebP streams
  * produced by an INDEPENDENT encoder (libwebp), paired with the
  * reference decoder's bit-exact Y/U/V reconstruction planes (its
  * YUV output is the post-loop-filter VP8 reconstruction, before any
  * RGB conversion). Deterministic synthetic photo-style content at
  * three sizes/qualities — 64x48 q75, 48x40 q40 (odd-free), 33x21
  * q90 (odd dims exercise the padded-macroblock crop). These streams
  * carry real encoder output: per-position coefficient probability
  * updates gated by RFC 6386 SS13.4's literal table, segment and
  * filter headers, and token streams under the SS13.5 default
  * probabilities — one wrong table entry in Vp8DefaultProbs
  * desynchronizes the bool decoder and fails the plane comparison.
  */
object Vp8ForeignFixtures {
  final case class Fx(w: Int, h: Int, webpB64: String, yB64: String,
      uB64: String, vB64: String)

  val all: Seq[Fx] = Seq(
    Fx(64, 48,
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
    "FRUbICcsNTg9QElPVlhaVlFNSUE2MjpBXWRoZF9gYWVrb3R0a2ZlY2JgW1dRTUlJcXFxcUtL" +
    "S0tcXFxcOjo6OhcXHSIpLjc6P0JLUVhaXFhTT0tDODQ8Q19mamZhYmNnbXF2dm5paGZlY15a" +
    "VFBMTHR0dHRPT09PX19fXz09PT0iIigtNDlAQUJFTk5VWFtXV1RTTTs3RElgZmllYGFjaGtv" +
    "eXlrZ2tpaGZhXVdTT095eXl5U1NTU2RkZGRCQkJCKysxNj1CSEdBQUdKUVRXVVlZV1JHQkpO" +
    "YGVmYl1fYWdma3JxZ2NmZ29vbWljX1tbfHx8fFZWVlZnZ2dnRUVFRTY2PEJJT1BMPTg5QUhS" +
    "W19dX15bWFNQU15gYFxXVVVXYWVkYmBbXGB7gIJ+eXVycl9fX196ezs8RUVFRV5kZWI/P0VL" +
    "UlhYUj01Mz1ETlhdX2NlY2FbVlheX11ZVFNTV11iYV9bVVhfg4qPi4aCf39iYmJifX4+P0hI" +
    "SEhqXlxlSkpOUldbW1VGQD5CR1BZXmRpbmZhXl5fYWFgXltaWVxfYmRiWFNbYoaNko6JhYKC" +
    "ZmZmZoGCQ0RNTU1NZWtkVEtLTVBTVVVTTklHS09WXWFfYWRgYF9gYWRlZmZkYmBiaGlqaGZk" +
    "aGuChYiHhYOCgmdnZ2eFhkZHUFBQUHFlW1hKSkpKSkpMTlZaXlpYVFFNUlBPV1xfYWJlZ2xu" +
    "c3d8enV0dnh9gH97d3Nzdnp+goJmZmZmTk5OTkZGRkZxc3IyS0tKSEZER0xeY2djYFlUUE1J" +
    "RlFbYGNlaGtydnyAg4F+fH+Cio+NhXRsanB3fYODZmZmZlFRUVFJSUlJdHZ1NVVVS05JRURL" +
    "Z25ybmlhWVVVUk9NW2NmaW1weX+HiYyIgX1+goyYkIh3b21zf3uAgWlpaWlWVlZWTk5OTnh6" +
    "ejpdXVVWUU1LUWZrbmlkXVdUWFhXWWhwcHBsbXN5gYSHhXt4e3+HkI2He3Z1fYZ3fH1ra2tr" +
    "WVlZWVFRUVF8fn09ZmZnXlpWWVphY2JeWlpbX11eYG5+hoF8aGNkaXFydXF2c3BzgYWHhYOC" +
    "hJGNcHN1ioqKinV1dXVhYWJiY2RlZW9vc2djX2JiYWFeWlZWV1tgZGh6i5KKgmlhX2Rsb3Nx" +
    "cW9ucX1+hoeJi46dlG1vcY6Ojo55eXl5ZGRlZWZnaGh6endybWpmZmRkYV1YV1hbaGxxfY6V" +
    "jYVsZGJocHR4dnBucXR8gYmLjZCSoJxrbG+SkpKSfX19fWhoaWlqa2xsfX16dXBtaWlnZmNf" +
    "WlhYW2pvdH+Plo6Gb2dla3N3e3pxb3F0foOKjJGSlKKebW5xlZWVlYGBgYFqamtrbGxtbX9/" +
    "fHl0cG1ra2plYFtdYGZscHWAkZePh3JqaG12e4B/cHBwcYqKi4uXmJiYXV1dXZqampqIiIiI" +
    "a2tra2trbGyCgn98d3Nwbm9taGNdX2FnbXJ3gpKYkIh1bWtweX6Dg3FxcXGMjIyMmpqammFh" +
    "YWGenp6ejY2NjW1tbW1tbW1thoaDgHt4dHJycGtmX2BjaW90eoGRmJGLeHBudH2DiIh0dHR0" +
    "j4+Pj52dnZ1lZWVloqKiopGRkZFxcXFxcXFxcYGBfnp1cW9weHl2cWtqa3BxdHd+jpWQi354" +
    "eH6HjJKSdnZ2dpGRkZGfn5+faGhoaKWlpaWUlJSUcXFxcXR0dHRzc29rZWFjZ4SIi4eCenRy" +
    "cXBveIiQjouHhouRmJygn56dm5q7s6migoKCgp2dnZ1sbGxsq2twbG9vb2+bW19cbW1pZF5Z" +
    "XWSLkpeTj4Z/enZxbXWGjo6Nj5GYnqSprq6fn5+gpKepqoaGhoagoKCgcHBwcK9vdHBwcHBw" +
    "n19jYHNzcG1pZGhtjpWalpKJgn2AfHB0hY6QkZOVnKGho6empaSjop6jqq+KioqKpaWlpXV1" +
    "dXW0dXl1dnZ2dqVlaWZ2dnZ1cm1xdYmNkI6NiIN+h4R+go2SlJSVlpqcnJ6jo6KioqKsra6v" +
    "jY2NjaioqKh5eXl5tXh9eXp9eXepaW1qeXl8fICFg35/enp+g4uTmJCTmZuampmYl5aUkpOR" +
    "jY2fn5+fi4yNjq6urq6vr6+vlZWVlbSxsbGOgnlziIiIiH19goSJjoyGe3Nxd3+KlZqYnKmq" +
    "o5+enJqYk46Oi4eHoKCgoI6PkJGysrKysrKyspiYmJi0tLS0hX93cYyMjIyDg4mNlJmXj352" +
    "dHqCjZidoqesraaioZydm56Zk46KiqWlpaWTlJWWtra2tre3t7eenp6eurq6unh3dHKSkpKS" +
    "fn6EiI+VlZCDfn6EjJWfo6Omqaefmp2apKOnopyXk5OoqKiolpeYmbe3t7e6urq6oqKior6+" +
    "vr5wcXJ0lZWVlXJyeH6FipCPjYyRlp2go6CioJ+ZjoqOlq60sK2ppqOjsLCxsbGxs7O1tba2" +
    "pKSkpMHHw7yLi4uLra2trYCKhJBubnR6gYePkZOVnKGoqaunpKCdlIiDg5Sww7m0sa+ur7Cx" +
    "srS2t7e3t7e3t6ioqKjHzM/Jj4+Pj7GxsbGMj4qOcXF3fYSKkpSWmJ+kq6yuqqejoJeLhoaV" +
    "uMLKt7O3t7e4uLm5urq7u7u7u7usrKysycrGxJSUlJS2tra2j4iIgnNzeX+GjJSWmJqhpq2u" +
    "sKyppaKZjYiIl73St7K1ubq6urq8vLy8vr6/v7+/r6+vr8W7sbaYmJiYurq6uodweXaioqKi" +
    "q6urq4ODg4OUlJSUt7e3tra4urynp6alo6KhoampqamoqKiowsLDw7y8u7u/u72+wcPGxoOD" +
    "g4OUlJSUpaWlpa6urq6Hh4eHl5eXl7q6urq6vL6+qqqpqKalpKSsrKysq6urq8XFxcW/v7+/" +
    "v7/Cw8bIy8uHh4eHmJiYmKqqqqqzs7Ozi4uLi5ycnJy/v7+/vr6/v6+vrqyrqaiosLCwsK+v" +
    "r6/JycnJw8PDw8PDxsfKzM/PjIyMjJ6enp6tra2ttra2to6Ojo6fn5+fwsLCwcC/v7+ysrGw" +
    "rq2srLOzs7OysrKyzMzMzMTExMTFxMfJzM7R0ZCQkI+hoaGhhYWFhZeXl5e0tLS0xMTExKio" +
    "p6ako6Kix8vR1czMzMzFxcXFvb2+vr6+v7/CwsLCx8TIiJiYmJjPzNCRgYGBgYiIiIibm5ub" +
    "u7u7u8bGxsasrKuqqKemps/R09PRz87NzczLysDAwcHBwcLCw8PDw8vHy4ycnJyc08/UlIWF" +
    "hYWMjIyMn5+fn76+vr5HR0dHsLCvrqyrqqrT0s/Q0tTU1E1NTU3ExMXFxcXGxsfHx8fQzNGR" +
    "Hx8fH9nV2ZqKioqKkJCQkKKioqJBQUNERUZISLOzsrGvrq2tWFNOSdfX19dSUlJSxsbHx8jI" +
    "ycnKysrK09DUlSMjIyPd2d2ejo6Ojjk5OTg4Ojw+rKysrKOjo6NOTk5OTUpEQK+vr6/BwcHB" +
    "wMHDxcvLy8tMTExMWF9aGNbV1tTU1djaKSkoJiQiISE8PDw8PD5AQK6urauqqKenUVFRUUlI" +
    "RkSysrKyxMTEw8PFx8jOzs7OTk5OTlphXBrZ2dnY2Nrc3S0tLCooJiUlQUFBQUBAQUGsrKys" +
    "q6urq1VVVVVERUhJtra2tsjIyMjHyMnJ0tLS0lJSUlJeZWAe3t7e3d3d3t4zMzIwLiwrK0RE" +
    "RENCQUFBMjIyMq6urq5ZWVlZQUNHTrq6urrMzMvLysrJydTU1NRVVVVVYWhjIeLi4uDf3t7e" +
    "Nzc2NDIwLy8rKysrpKaoqlBQUE9PUVNVs7Ozs0FDRUNGSUtOUVNUVEtNT1FaWlpa1dXV1WJb" +
    "YGAsLCwqKSgoKNLOk4+Tk5OTLi4uLCoqLCxUVFRTU1VXV7W1tbVFRUVGSk1PT1hYWFhPUVNT" +
    "X19eXVxbWlpcaFROMDAwLi0sLCxXUhgTlpaWljMzMzMqKisrWFhYWFdXWFg2NjY2SkpLTE1O" +
    "UFBcXFxcU1NUVGRkZGRYWFhYYktPSzY2NjQzMjIyVVEWEhUVFRU2NjUzMjAvL1tbW1pZWFhY" +
    "Nzc3N01NTk5PT1BQX19fX1RUVFRnZ2dnYGBgYElRTEw6Ojo4NzY2NldTGBQaGhoa",
    "f4KGio+Tl5iVkY2QmZ2bmpuamJeXm46SnZvNxJaJxMx+gYWJj5SYmJOOio+Zn52cnZyal5aY" +
    "i4+hncbMko7Cu4+Sko+MjY6TlZaUk5GPjY6Nj42RmaSXm4yIo73Hx8PHjo+Ojo2Mi5CTlJKQ" +
    "kZGQkZGSkZKVmpSZj4qcxMC+0GqLioeJjo+Oi4uMjpCRkpOUlJWWlZOLlJnJxcC8wMiWnoeE" +
    "gYWPk5CKhYWJjZGUl5iXl5qZk4aVmsjFwLy6wZmglJGOi4aEgICLkpaSiIWJiYeIjI2PkbPE" +
    "lZGMiGNgwb+QjoqIh4WBgIqPlJGKh4uMiYqPkZGTtMWUkYuIXFnEwZCOioeGhoSGiI2SkYqH" +
    "i417gpWRj5BWV5CTjpFVWLm9kpCMiYaDf4CGjJCNhoSIioyJl4eNiFtXk4uNhVRXwMOCgXuC" +
    "jpGLiYeIiouOkZWXi5dfK4KJiJBJX63Dr7qgrIODf4SLj4yHhIOFh4qNjZKSkCErgIKNj0tX" +
    "rLeuuaeyhIWGhYWHiIyKioiJiIWDiIiGg4IrKo+OkYaOkrZqUE2FiI2Hf3x/h5GSjoyKh359" +
    "iYuFhyoljol9hZGMTUleVXV5fYCFiYyNh4F+gYySk44jIpGQj46CgZGNSlOOjrG2d3p/gYKE" +
    "iYqHg398kzCGiCUnkpSOiYF8bDRJXn+SmWSAg4eJent+gIuLi4uBi4h4fYV/hyIiIiKNh5GL" +
    "SUtOT32AhIWCfXl2h4eHh3qChYKBfoWCJycnJ3+GgYhMSE5JeHt/goaIiomEgoKCkoqHiyMm" +
    "HiKDg4ODJC5NV4WaM0h0d3t9r7rK1X9/f3+4n46OZmQXFYGBgYEyMZSUiJcyQdfV0c2FfH52" +
    "3s51ZHl5eXmBgYGBYGxwiIODg4OYlIuN0c3IxKaifHnO1Whve3x8fX5/f4BhbGx0iIiIiJmU" +
    "oJDKvaqc1MbVyHR4wcVjY2NjZGRkZK+n1YqOjo6ORGw2O72+wMDIzsrRvrvGw2VlZGRjY2Ji" +
    "y8VtW5OTk5NVj4aK",
    "gIOHi5CVmJqcnqGlqq2xtLi7v8HCxMjL0NRueNnadXd9gISIjI+Tlpibn6KmqKyvs7a6vb/C" +
    "xsjR0Gtp09hvdHp8gIOFiIyPk5WZnZ+gpKerrrK2ur7CxL7QyGZjZXBydnl9f4GEiIuQkZWZ" +
    "m52hpKerr7K2ucDCwM3FVl1iam9xdHh7foGFiIqPk5SYnKCjpqmtr7G0u79PUlhbYF3Tmm5w" +
    "dHd7fYGEhouPkZWZnZ+jpqqsrrGwuExQVVlQXtKUamxwcnR2en2BhYmMjpGVl5ueoqOmr3hG" +
    "r7K4u25oYFdmaW1vb3B1eH+Dh4iJi4+RlpmdoKOubUCssLW5XmleUWFkaWprbXF2e3+DhIWG" +
    "io2RlZmboqlKUbGxrLNmW1ZSW15jZmdqb3J2en6AgYOHio2Tm6Cfpj9Gq6yzqVRgUVJUV11g" +
    "YmVrbnBydnl9f4OGhpCdp5iXoKBKS2JATEFvQlBTWVxeYWdpbG5ydXl8gIKCjp+slJSWlkVH" +
    "aTY6R2pCT1JXWVpdYmZpbHBydHd7fn6Dio+loJqVlZaqqz5DS1BLTlNVVlhdYGRobW9wcnd5" +
    "e3x/gZmXlJKSn5OgPUFSVkRHTE9RVFlcXmBkaGxwdHaOjImHiIqNj5icRkqYpDI/PkFHSk1R" +
    "V1lZW19jaW1xdIqFfnl8gIeMlqUwP5ejOUU7PkJFS01SVFRWW19aZWJtb3JydZGVmZ2Ag5WP" +
    "NT9ISjc6PkBBRk5UTlJYW2lkamRweHB4io2SkY2LhI83NjxFMjU5O0ZGRkZJTVJWXWJdYoZ/" +
    "h39zdnt+iVc4KX9XOTUuMTU3cYKaq0ZJT1KOmVNe1NaDhXB0eHyQVoyHgU4tMI+QkZE7QD1E" +
    "lp+5wlFVW15bXmNn2ejiqXh9g4iLjYSEiIiIiGdrNzumqLy9Sk1TV1RXXGDS5uKpdHh/goKD" +
    "jYaBeGpghIiWmzhAnqa+wsfLyMvQ1J2jx9Rucnl9xlQqHnR5gISElYaYmJ6Zn7e6wMPAw8jM" +
    "vbrOzmludHnigoSD"),
    Fx(48, 40,
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
    "S0tJRkI/PT09PTo2MjQ2PEJITVpsc2tjSUE/RU1TWVlLS0tLaGhoaDc3NzdTU1NTT09NSkZD" +
    "QUFBQT46Njg6QEZMUV5wd29nTUVDSVFXXV1PT09PbGxsbDs7OztXV1dXVVVTUExJR0dHR0RA" +
    "PD5ARkxSV2R2fXVtU0tJT1ddY2NVVVVVcnJyckFBQUFdXV1dUVFPTEhEREZNT05KRkdJTU1Q" +
    "U11vdnFsWlRVW2Npb29ZWVlZdnZ2dkVFRUVhYWFhR0dEQDs4O0BVWl1ZVU5IRkhHRkxdZWZm" +
    "Y2NqcHh8gX99e3p4VlZWVmhoaGhGRkZGRERBPTg0OUBbYmdjX1dRTUlFQkZVXmJlam13fYWL" +
    "kZF8fHx8WlpaWmxsbGxKSkpKSkpHQz46P0ZhaG1pZV1XU09LSExbZGhrcHN9g4uRl5eCgoKC" +
    "YGBgYHJycnJQUFBQT09OTEpJTE9fYmVkYl5aVltZWFxlam1wc3Z9gIWHi4qJiIODZWVlZXd3" +
    "d3dVVVVVVFRYW19iYl5VUVFTWF9pbm1wdHVzcXNzdXV2dXN0dHZ4eoCBa2tra1lZWlpaWltb" +
    "WVlfZGxxb2dSSkhNVF9rcXd9g4N7dnd3d3d1cWxoZWWBgYGBb29vb11dXl5eXl9fX19lanJ3" +
    "dW1YUE5TWmVxd32DiYmBfH19fX17d3Jua2uHh4eHdXV1dWNjZGRkZGVlWFheZGtxcm1eWVpf" +
    "ZnB7f4GEhoV+eXp8hIaFgXx4dXWLi4uLeXl5eWdjaGhoaGlpR0dNVFphaGlnaG90e36Bf4GA" +
    "fXhxbXF3jpOWko2JhoZya2Jbm6BfZJRgWFiGhYBKQUFHTVRaZGhtcXuAh4mLiISBfXZrZ292" +
    "lZyhnZiUkZFqZ2Nhn6RjaJhhXFyKiYROR0dNU1pgam5zd4GGjY+RjoqHg3xxbXV8m6Kno56a" +
    "l5dfYmZppappbp5nYmKQj4pUS0tRV15kbnF2eYOIkJOWlIyJhX50cHh/oqmuqqSfm5tYX2Vo" +
    "qq9udKNtaWmXlpFbUFBWXGNpcnR4eYOIkJGTjoyJhX51cnqBqLC0sKmjn5+8uWBgrbO2d3Fw" +
    "b2+dnJdhVVVbYWhudnh6fIWLk5WYlI+Lh4B4dX2ErLG0rqmloqK0tmBirbO2eHFxcXGfnplj" +
    "W1thZ250fH6AgouRmZuempmWjYZ+e3uKrreuqKeoqKiosWVurLC2eHR0dHOfnplmZWVrcXh+" +
    "g4OBgYeNlJebmZycl5OKhoaRqq6kn6Gko6Olr2h2qqy2eHd3dnWfnplpdXV7gYiOj4mAenuA" +
    "iJKdoqCjqaedmJeaoaKbmJiXlpassK+qqKiennt7enh5dnRugICGjJOZl4+Cenh9hI+boaSp" +
    "tLOpo6KhoJ+cmZaUkpKysq+qpqSenn5+fHp5dnRxhoaMkpmfnZWIgH6DipWhp660urmvqain" +
    "pqWin5yamJiysq+qpaGcnIGBf3x5dnR0hoaKjpOXl5ORjY2QlJ2nraqusrKtqqqqqamopqSl" +
    "pqmus7Ctn5uZmYGBf3x/enVyg4ODg4ODh4qgpKempKCcmZ6dnJ6kp6mqrK2wsbGys7O1vM7W" +
    "lZSWlrKysrKHgXhzg4OBfnt4foWqsbazrqihnpqXk5ahp6qsr7G2uLq8vr7BxcrOkZGTk7Ky" +
    "srKFgXx5iYmHhIB9g4qwt7y5tK6npKGfmZynrbCytbe8vsDCxMfLysXCkZGRkbKysrJ5fIGF" +
    "jY2Kh42Ji5CtsrWyraijoqGioqWprbW2tbW5vL/CxcrLyL+6kZGRkbKysrJweYWNurq1sKGd" +
    "mpukpaOgm5ycoKKkqrC5vLizsa6wtbq9v73Bv7m2wczY4YyMkJOYm5+fuLi1sayopKOioZ2a" +
    "lZeZnqOnrra/wr24sq2us7q9wL67uba0zNDV2IyMjIynp6enQ0NDQ6urqqmop6Ogm52fpKqv" +
    "tLvBw7+7trK0ucDCxcG+ure02NXQzIyMjIwtLS0tQkJCQqipqKesq6ekn6Gjqa+ytblFRUVF" +
    "s7O5vcTJz8+0tLS04djMxJubm5k1NTU1l5eYmJ+goaBHR0dHwr67t7OysbGxt7m9wcLCwlNT" +
    "U1PR0dHRFhYWFsXFvbaakoqKm5ucnJ2en59LS0tLwb67ubWzsLC2vL6/RERIS1BSVlVVVExD" +
    "KiIaGtjY0Mielo6OoaGioqOkpaVRUVBPTk1MTLOztbe6vcDARkZLT1RXWllYV01EMCggIN7e" +
    "1s6knJSUpaWmp6ipqqpVVVNRT01LS7e3ubq9vsDATExQVFpdYF9dXFNKOTMtKuLi2tKpoZmZ" +
    "RkZGRENCQkK0tLW1tre4uF1fUUVMVVVVx8fKy87R1NXW19fYRkRCOy0mKCsuMDExS0tLSUhH" +
    "REE9Ojg4OTo7R1dSSU9WWVlZxsbGxlVVVVXW1tbWT09PRTIrLzEyMzU1UVFRT05NSUVAPDk5" +
    "Ojs8RVJOTFZeX11aVlNSU1VXWltdXl5cWVdORjw2MzM2ODs7VFRUUlFQTUlFQT8/QEFCQ0tT" +
    "VVVbYV9bV1NTVVhaXl5fX19dXFpRST84MzU5PD8/",
    "mpWPjIyJg4OOmJ+ajIiPk4+FoJXGvNbMlZGKio6Oh4aMk5qYj42UmIR/oJrAutvVj4qDiZKV" +
    "jomJjZSVk5Sbn52eyMmOj7m5i4iFiI+SjomLjZGSkpSYmpGXx8yHjLzCiYuOi4eGipGTk5CQ" +
    "kZGOi4aYgZleZ8bPhYqRi4WDipKXlY6OkpKMh4abj4lbXL/AfoOKi4iKkZWUjoiLlpmTjqV9" +
    "mcqewZG0eH2EiIqPlpiQiIGGlZ2TilxPmcOatYijdnuChoqOlZWOhn+CkJSRhVhYm5vAx4yS" +
    "en+GiImKkZSQioN+iS+UjCtKk7KurY6MgYaNjISDipCUkYqGiIx4jIiXkJ9hU1xPf4uJjIaD" +
    "ho2Nj4+MiYaBiJCgcoJPOV9Je318g4iHhHx+goSQi4spK4yWSmCGgYpRhXl6d4KIgX16d42J" +
    "kZMoKpJUT06AjV1VkpWHiYaBenWFhCQieHCUjHd+bohKUjhX0Nl5gpB8dnaBh1JfZ2iSiop6" +
    "iBlXS32hfHx8fL7bgpB+gJBvWlFjZE1JlZZ0d0VMdnZ2ds3VzdV5cYl+a11yZ2Flj5GLhE1K" +
    "z8/Pxa6cpJzNeWZyf4Oqoo6GaHKDkIuSycnJw76/wc51YWppuLbLzc7IZ2SOjpGP",
    "gYaNkJOXnqKlqK+ztrrBx8zL1NNsanRyfIGIjI+SmZ2go6qusbW8wcbMwslsc2lvdXqBhYiM" +
    "k5aZnKOnqq61usi7al3KvWxfcXV8gIOHjpKVmJ+jpqqxtsK+WVTLxmJda3B3e36BiIyPkpmd" +
    "oKSrra2xt8BmaWlsZmtydnl9hIeKjZSYm5+mq6yxssRoaVpbYGRrb3J2fYGEh46SlZmgpUpW" +
    "tzp2SLmLW2Bnam1xeHx/gomOkpabn0xWsj55Sap6VltiZWhsc3d6fYSLkpWXmJdMtms2WqZs" +
    "UVZdYGNnbnJ1eH+Hj5KSko49sF8uNqp0S1BXWl1haGxvcnmBiYyMjpehlp5LZVBYRktNU1hc" +
    "Y2dqb3R9g4eMj5CSkJFDQVVhQktGTFFWXWBkaXB2e4GMlJaiOkWMjkxOPjtKSEtRWF1gX2xs" +
    "cXqFjJSPNzKDeU9FNEBASElLUlhZVoV9dHF0d4CMhJA6NUpElZ4+RkFGTVJRVaita2pobXd5" +
    "gn0lMoqXLTI5PaStTldOU1pftK3X0crFjIeLgTkvJywzOJShoKxNUlle09TLzNPfeIR7gCkt" +
    "gYWMh3Vod4Kfsrm+XFecmHFu4+GMgZCGe3+GioqPjZqosbi4say2uby33tZ9foCE"),
    Fx(33, 21,
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
    "MzQ2N1ZYXF4qLDAySUxPUnl7fX9oaWxtZWZpalhaXF4+OTo8PVxeYmQwMjY4T1JVWH+Bg4Vu" +
    "b3Jza2xvcF5gYmREQkNFRmVna205Oz9BWFteYYiKjI12d3p7c3R3eGZoamxMSElLTGttcXM/" +
    "QUVHXmFlZ46QkpR9foGCent+f21vcXNTNTY4OlNVWVthY2VnhomNj21vcXNiY2ZnZGZXVVVX" +
    "WVtaOz0/QFlbX2FnaWxtjI+TlXN1d3loaWxta1JaW1tdX2FgREZISWJkaGpvcnR1lJebnXt9" +
    "f4FwcXR1YV9eYmRmaGloS0xOT2hqbnB2eHp8m56ipIKEhoh3eHt8ZWZobmpsbnBviIuOkXd5" +
    "fX92eHp8aGtvcZGTlZezuKVki4yPkGprbm+WjpGUl31/g4V8foCCbnF1d5eZm53Ap6lpkZOV" +
    "lnBxdHWcl5qdoIaIjI6Fh4mLd3p+gKCipKausK91mpuen3l6fH6lnaCkpoyOkpSLjY+RfYCE" +
    "hqaoqqyytLJ4oKGkpX+Ag4SrgIGDhHBydni5v76/p6mtr5OVl5m2t7q7wsPFhoyOkJKBhoeJ" +
    "inZ4fH7Bw8XGra+ztZmbnZ+4ury+xsnMj5OUlpiIj5CSk3+BhYfFy8q0tri8vqKkpqjCw8XH" +
    "zc+3epudn6GPlZaYmYWHi43Ntbi7vL7CxKiqrK7Jy83Owr7FgaGjpaeXo6Smp46QlJZPU1c/" +
    "wcPHyairrrHM0NHSys2NkCgrLjGWqKmrrJSWmpxWQEFFxsnMz66xtLfV1dnaz9KSlS4xNDed" +
    "MDEzNJ2fo6VFRUlKTlFUV7e6vcDc4OHLV1oaHTc6PUAkNTY4OqOlqatMTU1RVFZaXL3AxMZi" +
    "SU5RXF8gIz1AREYrWFpcXUhLTlFOUFRWPkBERlNVV1hzdjc6V1ldXyAjJikW",
    "jo2ZmImJlJOgo5mclZePj8ONjJiXh4aRkaCjmZyUlo6Zwn9/iomPj5qZjpGHiqlawMBYfn6J" +
    "iI2MmJeOkYeKWlu9wVeQk4qNhoeGfI2NekSKjLi/i42Qh4qEh3uAjIopO4GCt7uKfYB3eo+S" +
    "jI2Bfo+PkaJYT0p6fXR3cT2Lh3+Fj4lJM1BLSXp+dHi3fYl/dn+JhhxFmZtFyMV0cWJlzs97" +
    "fo9TZoyZlY3Rz8zJyMfDw2JlZZLNy4mJgw==",
    "goiPlZuhqK63u8HGz9Lb33Z5f4aMkpifpa6yuL3Hzc7UbWxyen+Fi5OYoaWrsFhhV2B1Y2lw" +
    "dnyCiY+YnKKnUFtKVWxZXmZsc3Z9f4uVonSjqEBPvFBVXWNrcXN5goebZpWeMUGwQ0lQVmBq" +
    "ZnB3foeHk1xCRUw6P0dNV2Vcam5wgHmQXD1BQDA1Oj+wu1RfYGVyeI0mi5E3h4kzNK+0rLFU" +
    "W5yu43qBg4x9hYaOlJudpL3L0mPK0HWCfw=="))
}
