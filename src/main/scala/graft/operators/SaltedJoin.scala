package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (left) side's key into
  * `salts` sub-keys and replicate the right side across all salt values,
  * so one hot key's rows spread over `salts` reducers instead of
  * funnelling into a single task.
  *
  * This is the classic manual complement to AQE's skew-join splitting —
  * AQE only splits post-shuffle partitions of sort-merge joins; salting
  * also covers aggregations-after-join and engines/plans AQE can't touch.
  * At 100 TB: the left side gains one extra int column, the right side is
  * replicated `salts`× (keep it the smaller side), and the join remains a
  * plain hash equi-join on (key, salt) — no broadcast requirement.
  */
object SaltedJoin {

  /** Inner-join `left` and `right` on `key`, spreading each left key over
    * `salts` partitions. Right side must be the smaller one (it is
    * replicated `salts`×). Result columns = left ++ right-minus-key. */
  def inner(left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    // Salt derived from a stable row hash, NOT rand(): deterministic under
    // retries/replays, which a fault-tolerant 100 TB run requires.
    val salted = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val replicated = right
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
      .drop(replicated(key)).drop(salted("__salt")).drop(replicated("__salt"))
  }
}
