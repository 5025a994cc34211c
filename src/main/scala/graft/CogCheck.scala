package graft

import java.nio.file.{Files, Paths}

/** Dev tool: decode a written COG and print its envelope — the quick
  * validity probe for pipeline output (dims, tile grid, finite fraction,
  * value range). Usage: tools/run_verify.sh <cog.tiff> x graft.CogCheck */
object CogCheck {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println("usage: graft.CogCheck <cog.tiff> [...]"); return }
    args.filter(_.endsWith(".tiff")).foreach { p =>
      val bytes = Files.readAllBytes(Paths.get(p))
      val (w, h, vals, ovrDims, cloudOrdered) = plans.GeoTiff.decodeCog(bytes)
      val finite = vals.count(v => !v.isNaN)
      val fin = vals.filter(v => !v.isNaN)
      val (mn, mx) = if (fin.isEmpty) (Float.NaN, Float.NaN) else (fin.min, fin.max)
      println(f"$p%s: ${w}x${h} overview=$ovrDims cloud_ordered=$cloudOrdered " +
        f"finite=$finite (${100.0 * finite / vals.length}%.1f%%) range=[$mn%.4f, $mx%.4f]")
    }
  }
}
