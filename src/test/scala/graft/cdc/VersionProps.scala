package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the version encoding (driver-side arithmetic —
  * no Spark session, so the generator budget is cheap). Run by sbt's native
  * ScalaCheck integration alongside the ScalaTest suites. */
object VersionProps extends Properties("Cdc.versionOf") {

  private val coord = for {
    f <- Gen.chooseNum(1, 131071)
    p <- Gen.chooseNum(4L, (1L << 32) - 1)
    r <- Gen.chooseNum(0, Cdc.MaxRowIndex)
  } yield (f, p, r)

  private def enc(c: (Int, Long, Int)): Long =
    Cdc.versionOf(f"mysql-bin.${c._1}%06d", c._2, c._3)

  property("strictly monotone in lexicographic coordinate order") =
    forAll(coord, coord) { (a, b) =>
      java.lang.Long.compare(enc(a), enc(b)).sign ==
        Ordering[(Int, Long, Int)].compare(a, b).sign
    }

  property("round-trips its fields") = forAll(coord) { c =>
    val v = enc(c)
    val f = (v >> Cdc.FileShift).toInt
    val p = (v >> Cdc.PosShift) & ((1L << (Cdc.FileShift - Cdc.PosShift)) - 1)
    val r = (v & Cdc.MaxRowIndex).toInt
    f == c._1 && p == c._2 && r == c._3
  }

  property("never negative (sorts correctly as signed long)") = forAll(coord) { c =>
    enc(c) >= 0
  }
}
