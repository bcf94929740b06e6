package graft.core

import org.scalacheck.Prop.forAll
import org.scalacheck.Properties

/** ScalaCheck properties of the ported client logic (SURVEY §7.6) —
  * pure-model checks, no Spark session needed.
  */
object ClientPropertiesSpec extends Properties("clients") {

  private val charCount = new Clients.CharCount

  private def runLocal(strings: Seq[String]): Map[Char, Int] =
    strings
      .flatMap(s => charCount.map(null, s).iterator.toSeq)
      .groupBy(_._1)
      .map { case (k, kvs) =>
        charCount.reduce(k, kvs.map(_._2)).iterator.next()
      }

  property("charcount merge homomorphism: count(a ++ b) = count(a) ⊎ count(b)") =
    forAll { (a: List[String], b: List[String]) =>
      val merged = (runLocal(a).toSeq ++ runLocal(b).toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      runLocal(a ++ b) == merged
    }

  property("charcount mass conservation: Σcounts = Σ lengths") =
    forAll { (ss: List[String]) =>
      runLocal(ss).values.sum == ss.map(_.length).sum
    }

  property("mod histogram mass conservation + key range") =
    forAll { (ints: List[Int]) =>
      val client = new Clients.ModHistogram(100)
      val pairs = ints.flatMap(i => client.map(i, null).iterator.toSeq)
      val hist = pairs.groupBy(_._1).map { case (k, kvs) =>
        client.reduce(k, kvs.map(_._2)).iterator.next()
      }
      hist.values.sum == ints.size && hist.keys.forall(k => k >= 0 && k < 100)
    }
}
