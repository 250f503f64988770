package graft.readers

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.functions.{coalesce, col, expr, lit, when}
import org.apache.spark.sql.types.StructType

/** One clause of a MERGE — delta-spark's builder surface
  * (`whenMatched(cond).updateExpr(set)`, `whenMatched(cond).delete()`,
  * `whenNotMatched(cond).insertAll()`,
  * `whenNotMatchedBySource(cond).delete()/updateExpr(set)`;
  * reference delta-spark `DeltaMergeBuilder`) as plain data, shared by
  * the Delta and Iceberg writers.
  *
  *  - `kind`: `"matched"` | `"notMatched"` | `"notMatchedBySource"`.
  *  - `action`: `"update"` | `"delete"` (matched / bySource) or
  *    `"insert"` (notMatched).
  *  - `condition`: boolean SQL over the merge join — target columns
  *    qualify as `t.col`, source columns as `s.col` (bySource clauses
  *    see only `t`, notMatched clauses only `s`; unqualified names
  *    resolve where unambiguous). `None` = always applies.
  *  - `set`: column -> SQL expression assignments for update/insert
  *    (same qualification; values cast to the table column's type).
  *    Empty = every column from the source (updateAll / insertAll —
  *    these require the source schema to match the table). An insert
  *    with a non-empty set NULLs the unassigned columns; a bySource
  *    update requires a non-empty set (there is no source row to take
  *    columns from).
  *
  * SQL MERGE semantics: for each row, the FIRST clause of its kind
  * whose condition holds (in list order) applies; a row no clause
  * applies to survives unchanged (matched / bySource) or is not
  * inserted (notMatched). */
final case class MergeClause(kind: String, action: String,
    condition: Option[String] = None, set: Map[String, String] = Map.empty)

object MergeClause {
  /** `whenMatched(condition).updateExpr(set)`; empty set = updateAll. */
  def matchedUpdate(set: Map[String, String] = Map.empty,
      condition: String = null): MergeClause =
    MergeClause("matched", "update", Option(condition), set)

  /** `whenMatched(condition).delete()`. */
  def matchedDelete(condition: String = null): MergeClause =
    MergeClause("matched", "delete", Option(condition))

  /** `whenNotMatched(condition).insertExpr(set)`; empty set = insertAll. */
  def insert(set: Map[String, String] = Map.empty,
      condition: String = null): MergeClause =
    MergeClause("notMatched", "insert", Option(condition), set)

  /** `whenNotMatchedBySource(condition).updateExpr(set)`. */
  def bySourceUpdate(set: Map[String, String],
      condition: String = null): MergeClause =
    MergeClause("notMatchedBySource", "update", Option(condition), set)

  /** `whenNotMatchedBySource(condition).delete()`. */
  def bySourceDelete(condition: String = null): MergeClause =
    MergeClause("notMatchedBySource", "delete", Option(condition))
}

/** Clause validation + output-row assembly for the writers' MERGE.
  * Both writers share this so Delta and Iceberg merge semantics cannot
  * drift; the writers own detection, staging and commit. */
private[readers] object MergeClauses {

  private val kinds = Set("matched", "notMatched", "notMatchedBySource")

  def validate(clauses: Seq[MergeClause], schema: StructType, engine: String): Unit = {
    require(clauses.nonEmpty, s"$engine merge: at least one clause required")
    clauses.foreach { c =>
      require(kinds.contains(c.kind),
        s"$engine merge: unknown clause kind '${c.kind}' (${kinds.mkString(" | ")})")
      val okActions =
        if (c.kind == "notMatched") Set("insert") else Set("update", "delete")
      require(okActions.contains(c.action),
        s"$engine merge: clause kind '${c.kind}' cannot take action '${c.action}' " +
          s"(${okActions.mkString(" | ")})")
      require(c.action != "delete" || c.set.isEmpty,
        s"$engine merge: a delete clause cannot carry set expressions")
      if (c.kind == "notMatchedBySource" && c.action == "update")
        require(c.set.nonEmpty, s"$engine merge: whenNotMatchedBySource update requires " +
          "explicit set expressions (there is no source row to take columns from)")
      c.set.keys.foreach(k => require(schema.fieldNames.exists(_.equalsIgnoreCase(k)),
        s"$engine merge: set column '$k' is not a table column " +
          s"(${schema.fieldNames.mkString(",")})"))
      // a nondeterministic condition or value would evaluate
      // differently across the assembly's consumers (output vs change
      // feed) — silent divergence; refuse up front like deleteWhere
      (c.condition.toSeq ++ c.set.values).foreach(requireDeterministic(_, engine))
    }
  }

  private def requireDeterministic(sql: String, engine: String): Unit = {
    val e = scala.util.Try(CatalystSqlParser.parseExpression(sql)).getOrElse(
      throw new IllegalArgumentException(s"$engine merge: cannot parse expression '$sql'"))
    var ok = true
    e.foreach {
      case f: UnresolvedFunction
          if FileSkipping.nondeterministic.contains(f.nameParts.last.toLowerCase) => ok = false
      case _: SubqueryExpression => ok = false
      case _                     => ()
    }
    require(ok, s"$engine merge: expression '$sql' is nondeterministic or carries a " +
      "subquery — it would match different rows across the rewrite's consumers")
  }

  /** Do the clauses take EVERY column from the source (updateAll /
    * insertAll)? If so the writers require source schema = table
    * schema (the append contract); otherwise only the key columns
    * (plus whatever `s.`-references resolve at analysis). */
  def needsFullSchema(clauses: Seq[MergeClause]): Boolean = clauses.exists(c =>
    (c.kind == "matched" && c.action == "update" && c.set.isEmpty) ||
      (c.kind == "notMatched" && c.set.isEmpty))

  /** Assemble the rewrite output (and optionally the precise CDC diff)
    * from the touched-file rows.
    *
    *  - `tRows`: ONE (persisted) scan over every file the writer will
    *    rewrite — None when the table is empty or nothing rewrites.
    *  - `src` / `srcKeys`: the (persisted) source frame and its
    *    distinct non-null key tuples.
    *  - `matchedKeys`: distinct target key tuples that match a source
    *    key — the insert exclusion set (None = empty table: all
    *    eligible source rows insert).
    *
    * Matched rows pair 1:1 with their source row (the writers' dup-key
    * gate guarantees uniqueness) under aliases `t`/`s`; unmatched
    * target rows evaluate bySource clauses under `t`; eligible source
    * rows evaluate insert clauses under `s`. Per kind, the first
    * clause whose condition holds applies; no-clause rows survive
    * unchanged (or don't insert). Update/insert values cast to the
    * table column types so the staged parquet schema never drifts.
    *
    * Returns (output rows, cdc rows, affected positions) — cdc carries
    * `_change_type` of insert / delete / update_preimage /
    * update_postimage for exactly the rows a clause applied to, never
    * survivors.
    *
    * `morMeta` = Some((fileCol, rowIdxCol)) switches to MERGE-ON-READ
    * assembly: `tRows` carries those metadata columns, the output
    * holds ONLY the rows that must land in new files (update
    * post-images + inserts — survivors and unchanged rows stay in
    * their files), and the third element is the (fileCol, rowIdxCol)
    * frame of every target row a clause applied to — the rows the
    * caller masks with deletion vectors. */
  def assemble(tRows: Option[DataFrame], src: DataFrame, srcKeys: DataFrame,
      matchedKeys: Option[DataFrame], onT: Seq[String], schema: StructType,
      clauses: Seq[MergeClause], withCdc: Boolean,
      morMeta: Option[(String, String)] = None):
      (Option[DataFrame], Option[DataFrame], Option[DataFrame]) = {
    val order = schema.fieldNames.toSeq
    def typed(cn: String) = schema(cn).dataType
    val matchedCs = clauses.filter(_.kind == "matched").zipWithIndex
    val bySourceCs = clauses.filter(_.kind == "notMatchedBySource").zipWithIndex
    val insertCs = clauses.filter(_.kind == "notMatched").zipWithIndex

    val A = "__graft_applied"
    def appliedIdx(cs: Seq[(MergeClause, Int)]): Column =
      coalesce(cs.map { case (c, i) =>
        when(c.condition.map(expr).getOrElse(lit(true)), lit(i))
      } :+ lit(-1): _*)
    def setValue(c: MergeClause, cn: String, fallback: Column): Column =
      c.set.collectFirst { case (k, e) if k.equalsIgnoreCase(cn) =>
        expr(e).cast(typed(cn))
      }.getOrElse(fallback)
    // first-true-clause overlay for one output column: CASE over the
    // applied index, update clauses only (delete rows are filtered out)
    def overlay(cs: Seq[(MergeClause, Int)], cn: String, base: Column,
        emptySetValue: => Column): Column =
      cs.foldLeft(base) { case (acc, (c, i)) =>
        if (c.action != "update") acc
        else when(col(A) === i,
          if (c.set.isEmpty) emptySetValue else setValue(c, cn, base)).otherwise(acc)
      }
    def updIdxs(cs: Seq[(MergeClause, Int)]): Seq[Int] =
      cs.collect { case (c, i) if c.action == "update" => i }
    def tag(df: DataFrame, t: Column): DataFrame = df.withColumn("_change_type", t)

    val outB = Seq.newBuilder[DataFrame]
    val cdcB = Seq.newBuilder[DataFrame]
    val affB = Seq.newBuilder[DataFrame]
    def affCols: Seq[Column] = morMeta.toSeq.flatMap { case (fc, ric) =>
      Seq(col(fc).as(fc), col(ric).as(ric)) }

    // ---- matched target rows (paired 1:1 with their source row) -----
    tRows.foreach { t =>
      if (matchedCs.isEmpty) {
        // no matched clause: matched rows in touched files (a bySource
        // rewrite can touch files holding matched rows) pass through —
        // under merge-on-read they simply STAY in their files
        if (morMeta.isEmpty)
          outB += t.join(srcKeys, onT, "left_semi").select(order.map(col): _*)
      } else {
        val keyCond = onT.map(k => col(s"t.`$k`") === col(s"s.`$k`")).reduce(_ && _)
        val joined = t.as("t").join(src.as("s"), keyCond, "inner")
          .withColumn(A, appliedIdx(matchedCs))
        val delIdx = matchedCs.collect { case (c, i) if c.action == "delete" => i }
        val outCols = order.map(cn =>
          overlay(matchedCs, cn, col(s"t.`$cn`"), col(s"s.`$cn`")).as(cn))
        morMeta match {
          case None =>
            val kept =
              if (delIdx.isEmpty) joined
              else joined.where(!col(A).isin(delIdx.map(Int.box): _*))
            outB += kept.select(outCols: _*)
          case Some(_) =>
            // new files carry only the post-images; applied rows (the
            // pre-images, update AND delete) mask out via vectors
            val ui = updIdxs(matchedCs)
            if (ui.nonEmpty)
              outB += joined.where(col(A).isin(ui.map(Int.box): _*)).select(outCols: _*)
            affB += joined.where(col(A) >= 0).select(affCols: _*)
        }
        if (withCdc) {
          val applied = joined.where(col(A) >= 0)
          val ui = updIdxs(matchedCs)
          val preTag =
            if (ui.isEmpty) lit("delete")
            else when(col(A).isin(ui.map(Int.box): _*), lit("update_preimage"))
              .otherwise(lit("delete"))
          cdcB += applied.select(order.map(cn => col(s"t.`$cn`").as(cn)) :+
            preTag.as("_change_type"): _*)
          if (ui.nonEmpty)
            cdcB += applied.where(col(A).isin(ui.map(Int.box): _*))
              .select(outCols :+ lit("update_postimage").as("_change_type"): _*)
        }
      }
    }

    // ---- unmatched target rows (survivors / bySource clauses) -------
    tRows.foreach { t =>
      val un0 = t.join(srcKeys, onT, "left_anti")
      if (bySourceCs.isEmpty) {
        if (morMeta.isEmpty) outB += un0.select(order.map(col): _*)
      } else {
        val un = un0.as("t").withColumn(A, appliedIdx(bySourceCs))
        val delIdx = bySourceCs.collect { case (c, i) if c.action == "delete" => i }
        val outCols = order.map(cn =>
          // bySource update has no source row; empty sets are refused
          // by validate, so the emptySetValue branch is unreachable
          overlay(bySourceCs, cn, col(s"t.`$cn`"), col(s"t.`$cn`")).as(cn))
        morMeta match {
          case None =>
            val kept =
              if (delIdx.isEmpty) un
              else un.where(!col(A).isin(delIdx.map(Int.box): _*))
            outB += kept.select(outCols: _*)
          case Some(_) =>
            val ui = updIdxs(bySourceCs)
            if (ui.nonEmpty)
              outB += un.where(col(A).isin(ui.map(Int.box): _*)).select(outCols: _*)
            affB += un.where(col(A) >= 0).select(affCols: _*)
        }
        if (withCdc) {
          val applied = un.where(col(A) >= 0)
          val ui = updIdxs(bySourceCs)
          val preTag =
            if (ui.isEmpty) lit("delete")
            else when(col(A).isin(ui.map(Int.box): _*), lit("update_preimage"))
              .otherwise(lit("delete"))
          cdcB += applied.select(order.map(cn => col(s"t.`$cn`").as(cn)) :+
            preTag.as("_change_type"): _*)
          if (ui.nonEmpty)
            cdcB += applied.where(col(A).isin(ui.map(Int.box): _*))
              .select(outCols :+ lit("update_postimage").as("_change_type"): _*)
        }
      }
    }

    // ---- source rows matching no target row (insert clauses) --------
    if (insertCs.nonEmpty) {
      val eligible = matchedKeys.fold(src)(mk => src.join(mk, onT, "left_anti"))
      val s = eligible.as("s").withColumn(A, appliedIdx(insertCs))
      val ins = s.where(col(A) >= 0)
      val outCols = order.map { cn =>
        val nul = lit(null).cast(typed(cn))
        val v = insertCs.foldLeft(nul: Column) { case (acc, (c, i)) =>
          when(col(A) === i,
            if (c.set.isEmpty) col(s"s.`$cn`").cast(typed(cn))
            else setValue(c, cn, nul)).otherwise(acc)
        }
        v.as(cn)
      }
      outB += ins.select(outCols: _*)
      if (withCdc) cdcB += tag(ins.select(outCols: _*), lit("insert"))
    }

    (outB.result().reduceOption(_ unionByName _),
      if (withCdc) cdcB.result().reduceOption(_ unionByName _) else None,
      affB.result().reduceOption(_ unionByName _))
  }
}
