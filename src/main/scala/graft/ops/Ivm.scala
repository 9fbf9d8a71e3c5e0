package graft.ops

import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for JOIN views (insert-only deltas) —
  * the delta-rule complement to `graft.agg.IncrementalRollup`'s
  * aggregate maintenance: a materialized A⋈B refreshes from batch
  * deltas without re-joining the full inputs,
  *
  *   V_new = V_old ∪ (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * (the standard bilinear delta expansion; the three delta joins each
  * have a Δ-sized side, so refresh cost is ∝ |Δ|·matches, never
  * |A|·|B|). Deletes/updates need keyed retraction (the Cow/MERGE
  * machinery); this is the append-only fast path a warehouse actually
  * runs hourly.
  *
  * At scale the old-snapshot legs stay pruned: Catalyst pushes the
  * delta's join keys into the snapshot scans when the view is stored
  * partitioned/z-ordered by key (see `io/ZoneMap`), and each Δ side
  * broadcasts when batch-sized.
  */
object Ivm {

  /** Maintain `view` (= aOld ⋈ bOld on `keys`, same column layout)
    * under insert-only deltas `dA`, `dB`. Returns the refreshed view —
    * lazily, so the caller controls materialization/commit.
    */
  def joinDelta(view: DataFrame, aOld: DataFrame, dA: DataFrame,
                bOld: DataFrame, dB: DataFrame,
                keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    view
      .unionByName(dA.join(bOld, keys))
      .unionByName(aOld.join(dB, keys))
      .unionByName(dA.join(dB, keys))
  }
}
