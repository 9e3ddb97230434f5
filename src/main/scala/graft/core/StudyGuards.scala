package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-load validations over the current ontology
  * (AbstractDataProcessor.groovy:80-117) — the guards every upload runs
  * before touching data:
  *
  *  - the target path already holding SEVERAL study ids is unrecoverable
  *    (`checkStudiesBySamePath`, :81-91);
  *  - one occupying id is fine when it matches (re-upload) or when
  *    `replaceStudy` is set (the caller deletes the old study first,
  *    :97-100); a different id without replaceStudy fails (:104-106);
  *  - the same id already loaded under a DIFFERENT path fails; the
  *    canonical path is the study's lexicographically first c_fullname —
  *    the reference's first_value window (W1), a min() here (:108-116).
  */
object StudyGuards {

  final case class Conflict(message: String)

  /** Returns the occupying study id under `node` (to feed
    * [[checkStudyExist]] and the replace-study delete), or a Conflict when
    * several ids share the path. */
  def checkStudiesBySamePath(i2b2: DataFrame,
                             node: String): Either[Conflict, Option[String]] = {
    val ids = i2b2
      .filter(col("sourcesystem_cd").isNotNull &&
        col("c_fullname").startsWith(node))
      .select(col("sourcesystem_cd")).distinct()
      .orderBy(col("sourcesystem_cd"))
      .collect().map(_.getString(0))
    if (ids.length > 1)
      Left(Conflict(
        s"'$node' path contains several different studyIds: ${ids.mkString(", ")}"))
    else Right(ids.headOption)
  }

  /** None = load may proceed. `oldId` is [[checkStudiesBySamePath]]'s
    * result for the target node. */
  def checkStudyExist(i2b2: DataFrame, studyId: String, node: String,
                      oldId: Option[String],
                      replaceStudy: Boolean = false): Option[Conflict] = {
    oldId match {
      case Some(o) if !replaceStudy && o != studyId =>
        return Some(Conflict(
          s"Other study by the same path found with different studyId: old = '$o', new = '$studyId'"))
      case _ =>
    }
    val canonical = i2b2
      .filter(col("sourcesystem_cd") === studyId.toUpperCase)
      .agg(min(col("c_fullname"))).collect()
      .headOption.filterNot(_.isNullAt(0)).map(_.getString(0))
    canonical.filterNot(_ == node).map(p =>
      Conflict(s"Other study with same id found by different path: $p"))
  }
}
