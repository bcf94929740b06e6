package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties of the one-pass sketch kernels — pure-model
  * checks on [[HashOps]], no Spark session needed.
  */
object HashOpsPropertiesSpec extends Properties("hashops") {

  private val token: Gen[String] = Gen.alphaNumStr.map(_.take(8))
  private val tokens: Gen[List[String]] = Gen.listOf(token)
  private val someTokens: Gen[List[String]] =
    Gen.nonEmptyListOf(token.suchThat(_.nonEmpty))

  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  private def larr(ls: Seq[Long]): GenericArrayData =
    new GenericArrayData(ls.toArray)

  // SimHash sums per-token weights — commutative in exact integers, so
  // the signature is PERMUTATION-INVARIANT (bag semantics).
  property("simhash is permutation-invariant") =
    forAll(someTokens) { ts =>
      HashOps.simhash(arr(ts)) == HashOps.simhash(arr(scala.util.Random.shuffle(ts)))
    }

  property("simhash ignores empty tokens") =
    forAll(tokens) { ts =>
      HashOps.simhash(arr(ts)) == HashOps.simhash(arr(ts.filter(_.nonEmpty) ++ Seq("", "")))
    }

  // MinHash takes minima — permutation- and duplicate-invariant.
  property("minhash is permutation- and duplicate-invariant") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.choose(1, 8)) { (ls, k) =>
      val base = HashOps.minhash(larr(ls), k).toLongArray.toSeq
      val jumbled = HashOps.minhash(larr(scala.util.Random.shuffle(ls ++ ls)), k).toLongArray.toSeq
      base == jumbled
    }

  property("minhash signature agreement estimates Jaccard direction") =
    forAll(Gen.nonEmptyListOf(Gen.long)) { ls =>
      // identical sets agree on every component
      val a = HashOps.minhash(larr(ls), 16).toLongArray.toSeq
      val b = HashOps.minhash(larr(ls.reverse), 16).toLongArray.toSeq
      a == b
    }

  // Shingles are order-SENSITIVE (sequences, not bags)…
  property("shingle hashes detect reordering of a 3+-token window") =
    forAll(Gen.listOfN(6, Gen.alphaStr.suchThat(_.nonEmpty)).suchThat(_.distinct.size == 6)) { ts =>
      val fwd = HashOps.shingleHashes(arr(ts), 3).toLongArray.toSet
      val rev = HashOps.shingleHashes(arr(ts.reverse), 3).toLongArray.toSet
      fwd != rev
    }

  // …bounded in count, and deduplicated.
  property("shingle hashes: ≤ max(0, n-2) distinct 3-gram hashes") =
    forAll(tokens) { ts =>
      val out = HashOps.shingleHashes(arr(ts), 3).toLongArray
      out.length <= math.max(0, ts.length - 2) && out.distinct.length == out.length
    }

  property("shingle hashes of a repeated token collapse to one") =
    forAll(Gen.choose(3, 30), token.suchThat(_.nonEmpty)) { (n, t) =>
      HashOps.shingleHashes(arr(List.fill(n)(t)), 3).numElements() == 1
    }

  // Hamming distance between simhashes of the SAME bag is 0 — banding
  // always pairs exact duplicates.
  property("exact duplicate docs always share all simhash bands") =
    forAll(someTokens) { ts =>
      val s1 = HashOps.simhash(arr(ts))
      val s2 = HashOps.simhash(arr(scala.util.Random.shuffle(ts)))
      Prop(java.lang.Long.bitCount(s1 ^ s2) == 0)
    }
}
