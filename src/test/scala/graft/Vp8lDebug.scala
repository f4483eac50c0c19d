package graft

import graft.multimodal.Multimodal

object Vp8lDebug {
  // replicate Vp8lCodec.huffmanLengths
  def huffmanLengths(hist: Array[Long], maxLen: Int = 15): Array[Int] = {
    val n = hist.length
    val used = (0 until n).filter(hist(_) > 0)
    val lengths = new Array[Int](n)
    if (used.isEmpty) return lengths
    if (used.size == 1) { lengths(used.head) = 1; return lengths }
    case class Node(w: Long, syms: List[Int], depths: Map[Int, Int])
    val pq = new scala.collection.mutable.PriorityQueue[Node]()(
      Ordering.by[Node, Long](_.w).reverse)
    used.foreach(s => pq.enqueue(Node(hist(s), List(s), Map(s -> 0))))
    while (pq.size > 1) {
      val a = pq.dequeue(); val b = pq.dequeue()
      val depths = (a.depths.map { case (s, d) => s -> (d + 1) }) ++
        (b.depths.map { case (s, d) => s -> (d + 1) })
      pq.enqueue(Node(a.w + b.w, a.syms ++ b.syms, depths))
    }
    val d = pq.dequeue().depths
    d.foreach { case (s, l) => lengths(s) = l }
    lengths
  }

  def main(args: Array[String]): Unit = {
    val (w, h) = (31, 17)
    val px = (0 until w * h).map { i =>
      val (x, y) = (i % w, i / w)
      val g = ((5 * 31 + x * 7 + y * 13) % 256)
      (0xff << 24) | (g << 16) | (g << 8) | g
    }.toArray
    val hG = new Array[Long](256 + 24)
    val hR = new Array[Long](256)
    px.foreach { p =>
      hG((p >> 8) & 0xff) += 1
      hR((p >> 16) & 0xff) += 1
    }
    for ((name, hist) <- Seq(("G", hG), ("R", hR))) {
      val l = huffmanLengths(hist)
      println(s"$name: used=${l.count(_ > 0)} maxLen=${l.max}")
      val clHist = new Array[Long](19)
      l.foreach(v => clHist(v) += 1)
      val cl = huffmanLengths(clHist, maxLen = 7)
      println(s"$name clc: used=${cl.count(_ > 0)} maxLen=${cl.max} " +
        s"lens=${cl.zipWithIndex.filter(_._1 > 0).map { case (v, s) => s"$s:$v" }.mkString(",")}")
    }
    // same for 31x16 (passing)
    val px2 = px.take(31 * 16)
    val hG2 = new Array[Long](256 + 24)
    px2.foreach(p => hG2((p >> 8) & 0xff) += 1)
    val l2 = huffmanLengths(hG2)
    println(s"G@31x16: used=${l2.count(_ > 0)} maxLen=${l2.max}")
    val clHist2 = new Array[Long](19)
    l2.foreach(v => clHist2(v) += 1)
    val cl2 = huffmanLengths(clHist2, maxLen = 7)
    println(s"G@31x16 clc: maxLen=${cl2.max} " +
      s"lens=${cl2.zipWithIndex.filter(_._1 > 0).map { case (v, s) => s"$s:$v" }.mkString(",")}")
  }
}
