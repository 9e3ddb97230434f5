package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Security / metadata maintenance as functional rewrites (SURVEY §2.10):
  * i2b2_secure rebuild (I2B2_LOAD_SECURITY_DATA.sql:120-135),
  * bio_experiment / bio_data_uid upsert (I2B2_LOAD_STUDY_METADATA.sql:
  * 103-260), and the replace-study `EXP:` token transplant
  * (PostStudyProcessor.groovy:43-65, COPY_SECURITY_FROM_OTHER_STUDY.sql).
  */
object SecurityOps {

  /** i2b2_secure = the study's i2b2 rows re-tokened: `EXP:<studyId>` when
    * the study is secure, `EXP:PUBLIC` otherwise. */
  def rebuildI2b2Secure(i2b2: DataFrame, studyId: String, secure: Boolean): DataFrame =
    i2b2.withColumn("secure_obj_token",
      if (secure) lit(s"EXP:$studyId") else lit("EXP:PUBLIC"))

  /** Upsert rows into a keyed table: new rows win, old non-conflicting rows
    * survive (set-based MERGE without Delta — recompute + publish). */
  def upsertByKey(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(incoming)

  /** bio_experiment upsert keyed on accession (= study id). */
  def upsertBioExperiment(bioExperiment: DataFrame, studyId: String,
                          title: String): DataFrame = {
    val incoming = bioExperiment.sparkSession
      .createDataFrame(java.util.List.of[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(studyId, title)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("accession",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("title",
            org.apache.spark.sql.types.StringType))))
    upsertByKey(bioExperiment, incoming, Seq("accession"))
  }

  /** Replace-study token transplant: every security row carrying the old
    * study's token is rewritten to the new study's token (biomart /
    * searchapp sweep). */
  def swapSecurityTokens(table: DataFrame, tokenCol: String,
                         oldStudyId: String, newStudyId: String): DataFrame =
    table.withColumn(tokenCol,
      when(col(tokenCol) === s"EXP:$oldStudyId", lit(s"EXP:$newStudyId"))
        .otherwise(col(tokenCol)))

  /** COPY_SECURITY_FROM_OTHER_STUDY.sql:37-59: replicate the source
    * study's access grants onto the target study's secure object. The
    * target object id resolves through bio_experiment(accession) ->
    * bio_data_uid -> search_secure_object; the source directly by its
    * `EXP:` token. New grant ids continue past the current max (sequence
    * replacement); the copy keeps each grant's principal and level.
    * Missing target/source resolves to a no-op (the proc's SELECT INTO
    * would find nothing to insert). */
  def copySecurityFromOtherStudy(
      access: DataFrame,        // auth_sec_obj_access_id, auth_principal_id,
                                //   secure_object_id, secure_access_level_id
      secureObjects: DataFrame, // search_secure_object_id, bio_data_unique_id
      bioDataUid: DataFrame,    // bio_data_id, unique_id
      bioExperiment: DataFrame, // bio_experiment_id, accession
      studyId: String, studyIdFrom: String): DataFrame = {
    def scalar(df: DataFrame): Option[Long] =
      df.collect().headOption.map(_.getLong(0))
    val targetObj = for {
      bioId <- scalar(bioExperiment.filter(col("accession") === studyId)
        .select(col("bio_experiment_id")))
      uid <- bioDataUid.filter(col("bio_data_id") === bioId)
        .select(col("unique_id")).collect().headOption.map(_.getString(0))
      objId <- scalar(secureObjects.filter(col("bio_data_unique_id") === uid)
        .select(col("search_secure_object_id")))
    } yield objId
    val sourceObj = scalar(secureObjects
      .filter(col("bio_data_unique_id") === s"EXP:$studyIdFrom")
      .select(col("search_secure_object_id")))
    (targetObj, sourceObj) match {
      case (Some(to), Some(from)) =>
        val maxId = scalar(access.agg(max(col("auth_sec_obj_access_id"))))
          .getOrElse(0L)
        val copied = graft.core.Ids.denseIds(
          access.filter(col("secure_object_id") === from)
            .select(col("auth_principal_id"), col("secure_access_level_id")),
          Seq("auth_principal_id", "secure_access_level_id"),
          "auth_sec_obj_access_id", startAt = maxId + 1)
          .withColumn("secure_object_id", lit(to))
        access.unionByName(copied.select(access.columns.map(col): _*))
      case _ => access
    }
  }
}
