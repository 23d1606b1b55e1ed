package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Majority-vote quality ensemble: N independent boolean quality
  * verdicts (Gopher battery, C4 rules, wordlist caps, classifier
  * thresholds…) combined into a per-document vote count and a
  * `votes >= minVotes` keep decision. The ensemble slot exists because
  * single heuristic filters disagree heavily on real crawls (that
  * disagreement is exactly what [[graft.operators.stats.RaterAgreement]]
  * measures) — requiring agreement-of-k trades recall for much higher
  * precision, the standard pretraining-data move.
  *
  * All verdicts are pure per-row Column expressions, so the whole
  * ensemble fuses into ONE codegen'd projection — no shuffle, no joins,
  * nothing but the corpus scan. NULL verdicts (a rater abstaining on a
  * NULL text) count as a non-vote (false), both engines by the same
  * explicit coalesce.
  */
final class QualityVote(
    raters: Seq[Column],
    minVotes: Int,
    idCol: String = "doc_id") {

  require(raters.nonEmpty && minVotes >= 1 && minVotes <= raters.size,
    "need 1 <= minVotes <= raters")
  val name = "quality_vote"

  /** `(id, votes, keep)` ordered by id. */
  def apply(df: DataFrame): DataFrame = {
    val votes = QualityVote.votesCol(raters)
    df.select(col(idCol).as("id"), votes.as("votes"))
      .select(col("id"), col("votes"), (col("votes") >= minVotes).as("keep"))
      .orderBy(col("id"))
  }

  /** DuckDB twin: `raterSqls` are the verdict expressions over `table`'s
    * columns (each rater's own keepSql twin).
    */
  def sql(table: String, raterSqls: Seq[String], idExpr: String = "doc_id",
      prelude: String = ""): String = {
    val votes = raterSqls
      .map(r => s"CAST(coalesce(($r), FALSE) AS INTEGER)").mkString(" + ")
    s"""WITH $prelude
       |_qv AS (SELECT $idExpr AS id, ($votes) AS votes FROM $table)
       |SELECT id, votes, votes >= $minVotes AS keep FROM _qv ORDER BY id""".stripMargin
  }
}

object QualityVote {
  /** The single source of truth for vote counting (NULL abstains as a
    * non-vote) — shared by the report and the registry filter so the
    * two surfaces cannot drift.
    */
  def votesCol(raters: Seq[Column]): Column =
    raters.map(r => coalesce(r, lit(false)).cast("int")).reduce(_ + _)
}

/** The registry/YAML surface of [[QualityVote]]: a [[graft.core.RowFilter]]
  * keeping rows that clear `minVotes` of the configured heuristic raters
  * (`gopher`, `c4`, `wordlist` — the built-in battery; all df-free
  * per-row predicates, so the ensemble stays one fused projection with
  * reject capture via the standard disposition machinery).
  */
final class QualityVoteFilter(
    raterNames: Seq[String],
    minVotes: Int,
    textCol: String = "text",
    wordlistWords: Seq[String] = Nil,
    wordlistMaxHitFrac: Double = 0.1) extends graft.core.RowFilter {

  require(raterNames.nonEmpty, "at least one rater")
  val name = "quality_vote_filter"

  private val raters: Seq[Column] = raterNames.map {
    case "gopher" => new GopherQualityFilter(textCol).keepCol
    case "c4" => new C4QualityFilter(textCol).keepCol
    case "wordlist" =>
      require(wordlistWords.nonEmpty, "wordlist rater needs words")
      new WordlistFilter(wordlistWords, maxHitFrac = wordlistMaxHitFrac,
        textCol = textCol).keepCol
    case other => throw new IllegalArgumentException(
      s"unknown rater '$other' (available: gopher, c4, wordlist)")
  }
  require(minVotes >= 1 && minVotes <= raters.size,
    "need 1 <= minVotes <= raters")

  def keep(df: DataFrame): Column =
    QualityVote.votesCol(raters) >= minVotes
}
