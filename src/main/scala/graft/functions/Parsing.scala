package graft.functions

/** Pure parsing helpers mirroring the reference's two unit-tested scalar
  * functions (HandlerTest.java:35-46) — kept pure so ScalaCheck can
  * exercise them exhaustively; the Column-level twins live in the queries
  * (split().getItem) and in [[graft.streaming.Replicator]].
  */
object Parsing {

  /** Stream name from a Kinesis event-source ARN —
    * `arn.split(":")[5].split("/")[1]` (Handler.java:169-171).
    * e.g. `arn:aws:kinesis:us-east-1:1000000000:stream/kds-stream-1/consumer/kds-replicator:843...`
    * → `kds-stream-1`. Returns None where the reference would throw.
    */
  def streamNameFromArn(arn: String): Option[String] = {
    val parts = arn.split(":")
    if (parts.length <= 5) None
    else {
      val sub = parts(5).split("/")
      if (sub.length <= 1) None else Some(sub(1))
    }
  }

  /** Numeric-string sequence-number ordering key: Kinesis sequence numbers
    * are decimal strings whose numeric order is (length, lexicographic) —
    * plain string compare would put "9" after "10".
    */
  def sequenceOrderKey(seq: String): (Int, String) = (seq.length, seq)

  /** Jaccard similarity of two sets — the verify step of every near-dup
    * candidate pair (DedupOps).
    */
  def jaccard[A](a: Set[A], b: Set[A]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size
}
