package graft.queries

/** DuckDB oracle SQL — one entry per query key in SparkEntry.queries.
  *
  * Conventions (driver hash-compares values after sorting columns by name):
  *  - aliases match the Spark side exactly, all lowercase
  *  - every double passes through round(_, n) with the same n as Spark
  *  - integer-typed SUMs are CAST(.. AS BIGINT): DuckDB widens int sums to
  *    HUGEINT, which pandas/pyarrow may render differently than Spark's long
  *  - identical numeric-gating regexes where string->double casting matters
  */
object Oracles {

  /** Shared numeric-gate regex — must equal CleansingFunctions.NumericRegex. */
  private val NumRx = "^[+-]?((\\d+(\\.\\d*)?)|(\\.\\d+))([eE][+-]?\\d+)?$"

  private val EavCte =
    """WITH eav AS (
      |  SELECT c_custkey, attribute, value FROM (
      |    SELECT c_custkey, 'c_name' AS attribute, c_name AS value FROM customer
      |    UNION ALL SELECT c_custkey, 'c_mktsegment', c_mktsegment FROM customer
      |    UNION ALL SELECT c_custkey, 'c_acctbal', CAST(c_acctbal AS VARCHAR) FROM customer
      |    UNION ALL SELECT c_custkey, 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer)
      |  WHERE length(coalesce(value, '')) > 0)
      |""".stripMargin

  private val GeoJoin =
    "FROM region JOIN nation ON r_regionkey = n_regionkey JOIN customer ON n_nationkey = c_nationkey"

  val treeAndEav: Map[String, String] = Map(
    "p1_eav_explode" -> (EavCte + "SELECT * FROM eav"),

    "a1_type_inference" -> (EavCte +
      s"""SELECT attribute,
         |  CAST(sum(CASE WHEN regexp_matches(value, '$NumRx') THEN 0 ELSE 1 END) AS BIGINT)
         |    AS non_numeric_count,
         |  count(*) AS n_values,
         |  CASE WHEN sum(CASE WHEN regexp_matches(value, '$NumRx') THEN 0 ELSE 1 END) = 0
         |       THEN 'N' ELSE 'T' END AS inferred_type
         |FROM eav GROUP BY 1""".stripMargin),

    "eav_observation_fact" -> (EavCte +
      s""", types AS (
         |  SELECT attribute,
         |    CASE WHEN sum(CASE WHEN regexp_matches(value, '$NumRx') THEN 0 ELSE 1 END) = 0
         |         THEN 'N' ELSE 'T' END AS inferred_type
         |  FROM eav GROUP BY 1)
         |SELECT c_custkey, attribute, inferred_type AS valtype_cd,
         |  CASE WHEN inferred_type = 'T' THEN value ELSE 'E' END AS tval_char,
         |  round(CASE WHEN inferred_type = 'N' THEN CAST(value AS DOUBLE) END, 2) AS nval_num
         |FROM eav JOIN types USING (attribute)""".stripMargin),

    "p7_fill_in_tree" ->
      s"""SELECT c_fullname, CAST(c_hlevel AS BIGINT) AS c_hlevel, c_name FROM (
         |  SELECT DISTINCT '\\' || r_name || '\\' AS c_fullname, 1 AS c_hlevel, r_name AS c_name $GeoJoin
         |  UNION
         |  SELECT DISTINCT '\\' || r_name || '\\' || n_name || '\\', 2, n_name $GeoJoin
         |  UNION
         |  SELECT DISTINCT '\\' || r_name || '\\' || n_name || '\\' || c_name || '\\', 3, c_name $GeoJoin)""".stripMargin,

    "a8_concept_counts" ->
      s"""SELECT c_fullname, count(DISTINCT c_custkey) AS patient_count FROM (
         |  SELECT '\\' || r_name || '\\' AS c_fullname, c_custkey $GeoJoin
         |  UNION ALL
         |  SELECT '\\' || r_name || '\\' || n_name || '\\', c_custkey $GeoJoin
         |  UNION ALL
         |  SELECT '\\' || r_name || '\\' || n_name || '\\' || c_name || '\\', c_custkey $GeoJoin)
         |GROUP BY 1""".stripMargin,

    "a9_children_counts" ->
      s"""SELECT parent_path, count(*) AS n_children FROM (
         |  SELECT DISTINCT '\\' || r_name || '\\' AS parent_path,
         |    '\\' || r_name || '\\' || n_name || '\\' AS child $GeoJoin
         |  UNION ALL
         |  SELECT DISTINCT '\\' || r_name || '\\' || n_name || '\\',
         |    '\\' || r_name || '\\' || n_name || '\\' || c_name || '\\' $GeoJoin)
         |GROUP BY 1""".stripMargin,

    "fn_path_scalars" ->
      s"""SELECT '\\' || r_name || '\\' || n_name || '\\' || c_name || '\\' AS path,
         |  n_name AS nth2, c_name AS last_component, CAST(3 AS BIGINT) AS hlevel,
         |  CAST(length('\\' || r_name || '\\' || n_name || '\\' || c_name || '\\')
         |       - length(c_name) - 1 AS BIGINT) AS instr_2nd_from_end
         |$GeoJoin""".stripMargin,

    "f1_fix_column" ->
      """WITH d AS (SELECT p_partkey, '  "' || p_name || ' *100% \ & done"  ' AS dirty FROM part),
        |s1 AS (SELECT p_partkey, dirty, trim(dirty) AS t FROM d),
        |s2 AS (SELECT p_partkey, dirty,
        |         CASE WHEN t LIKE '"%"' AND length(t) >= 2
        |              THEN trim(substring(t, 2, length(t) - 2)) ELSE t END AS t FROM s1)
        |SELECT p_partkey, dirty,
        |  regexp_replace(
        |    replace(replace(replace(replace(t, '\', ''), '%', 'PCT'), '*', ''), '&', ' and '),
        |    '[^\x00-\x7F]', '', 'g') AS clean
        |FROM s2""".stripMargin,

    "f2_value_cleanup" ->
      """WITH d AS (SELECT p_partkey,
        |    '|' || replace(p_type, ' ', '_') || '+50%_done(plus),,|' AS dirty FROM part)
        |SELECT p_partkey, dirty,
        |  trim(regexp_replace(
        |    regexp_replace(
        |      replace(
        |        regexp_replace(
        |          replace(
        |            replace(
        |              regexp_replace(regexp_replace(dirty, '^\|+', '', 'g'), '\|+$', '', 'g'),
        |            '|', '-'),
        |          '%', ' Pct'),
        |        '[&+]', ' and ', 'g'),
        |      '(plus)', '+'),
        |    ' {2,}', ' ', 'g'),
        |  ',+$', '', 'g')) AS clean
        |FROM d""".stripMargin,

    // each branch re-derives the rule predicate independently of the
    // ValidationRules compiler
    "f8_validation" ->
      """WITH c AS (
        |  SELECT c_name, CAST(c_acctbal AS VARCHAR) AS v, c_mktsegment FROM customer)
        |SELECT 'required' AS rule,
        |  CAST(sum(CASE WHEN length(coalesce(v, '')) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |  coalesce(string_agg(CASE WHEN length(coalesce(v, '')) = 0 THEN c_name END, ',' ORDER BY c_name), '') AS violator_ids
        |FROM c
        |UNION ALL
        |SELECT '>0',
        |  CAST(sum(CASE WHEN TRY_CAST(v AS DOUBLE) <= 0 THEN 1 ELSE 0 END) AS BIGINT),
        |  coalesce(string_agg(CASE WHEN TRY_CAST(v AS DOUBLE) <= 0 THEN c_name END, ',' ORDER BY c_name), '')
        |FROM c
        |UNION ALL
        |SELECT 'between 100 to 5000',
        |  CAST(sum(CASE WHEN TRY_CAST(v AS DOUBLE) < 100 OR TRY_CAST(v AS DOUBLE) > 5000 THEN 1 ELSE 0 END) AS BIGINT),
        |  coalesce(string_agg(CASE WHEN TRY_CAST(v AS DOUBLE) < 100 OR TRY_CAST(v AS DOUBLE) > 5000 THEN c_name END, ',' ORDER BY c_name), '')
        |FROM c
        |UNION ALL
        |SELECT '<9000, when "c_mktsegment" is equal to "BUILDING"',
        |  CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' AND TRY_CAST(v AS DOUBLE) >= 9000 THEN 1 ELSE 0 END) AS BIGINT),
        |  coalesce(string_agg(CASE WHEN c_mktsegment = 'BUILDING' AND TRY_CAST(v AS DOUBLE) >= 9000 THEN c_name END, ',' ORDER BY c_name), '')
        |FROM c""".stripMargin,

    "f6_usubjid" ->
      """SELECT c_custkey,
        |  regexp_replace(concat_ws(':', 'TRIAL1',
        |    CASE WHEN c_nationkey % 2 = 0 THEN '' ELSE CAST(c_nationkey AS VARCHAR) END,
        |    c_name), ':{2,}', ':', 'g') AS usubjid
        |FROM customer""".stripMargin,
  )

  /** Tokenize + 3-gram-shingle CTE shared by the dedup oracles. */
  private val ShingleCte =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> array_to_string(t[i:i+2], ' ')))) AS shingle
      |  FROM toks WHERE len(t) >= 3)
      |""".stripMargin

  /** The full DuckDB simhash recomputation, ending in hashes(doc_id, simhash). */
  private val SimhashCte =
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
      |    x -> len(x) > 0)) AS token FROM documents),
      |tw AS (SELECT doc_id, token, count(*) AS w FROM toks GROUP BY 1, 2),
      |th AS (SELECT doc_id, w, substring(md5(token), 1, 16) AS h16 FROM tw),
      |nibs0 AS (
      |  SELECT doc_id, w, i AS pos,
      |    strpos('0123456789abcdef', substring(h16, i, 1)) - 1 AS nib
      |  FROM th, unnest(range(1, 17)) p(i)),
      |bits AS (
      |  SELECT doc_id, w, (pos - 1) * 4 + b AS bitpos,
      |    CASE b WHEN 0 THEN (nib // 8) % 2 WHEN 1 THEN (nib // 4) % 2
      |           WHEN 2 THEN (nib // 2) % 2 ELSE nib % 2 END AS bit
      |  FROM nibs0, unnest(range(0, 4)) u(b)),
      |votes AS (
      |  SELECT doc_id, bitpos, sum(CASE WHEN bit = 1 THEN w ELSE -w END) AS vote
      |  FROM bits GROUP BY 1, 2),
      |nibs AS (
      |  SELECT doc_id, bitpos // 4 AS nibpos,
      |    sum((CASE WHEN vote > 0 THEN 1 ELSE 0 END) *
      |        (CASE bitpos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) AS nibval
      |  FROM votes GROUP BY 1, 2),
      |hashes AS (
      |  SELECT doc_id,
      |    string_agg(substring('0123456789abcdef', (nibval + 1)::INT, 1), '' ORDER BY nibpos)
      |      AS simhash
      |  FROM nibs GROUP BY 1)
      |""".stripMargin

  private val JaccardTail =
    """sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
      |SELECT doc_a, doc_b, round(c::DOUBLE / (sa.n + sb.n - c)::DOUBLE, 6) AS jaccard
      |FROM common JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
      |WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.5""".stripMargin

  private val EmbCosine =
    """list_sum(list_transform(range(1, len(a.embedding) + 1),
      |      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
      |    (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE))) *
      |     sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))""".stripMargin

  /** Mirrors SourcesAndOps: synthesized inputs recomputed end-to-end. */
  val sourcesAndOps: Map[String, String] = Map(
    "p3_acgh_melt" ->
      """SELECT 'R' || n_nationkey AS region_id, 'S1' AS sample_id,
        |  CAST(n_nationkey * 2 AS VARCHAR) AS chip,
        |  CAST(n_nationkey % 3 AS VARCHAR) AS segmented,
        |  CAST(n_nationkey % 2 AS VARCHAR) AS flag,
        |  CAST(n_nationkey % 5 AS VARCHAR) AS probloss,
        |  CAST(n_nationkey % 7 AS VARCHAR) AS probnorm,
        |  CAST(n_nationkey % 11 AS VARCHAR) AS probgain,
        |  CAST(n_nationkey % 13 AS VARCHAR) AS probamp
        |FROM nation
        |UNION ALL
        |SELECT 'R' || n_nationkey, 'S2',
        |  CAST(n_regionkey * 3 AS VARCHAR), CAST(n_regionkey % 2 AS VARCHAR),
        |  CAST(n_regionkey % 3 AS VARCHAR), CAST(n_regionkey % 5 AS VARCHAR),
        |  CAST((n_regionkey + n_nationkey) % 7 AS VARCHAR),
        |  CAST((n_regionkey + n_nationkey) % 11 AS VARCHAR),
        |  CAST((n_regionkey + n_nationkey) % 13 AS VARCHAR)
        |FROM nation""".stripMargin,

    "p4_vcf_summary" ->
      """WITH base AS (
        |  SELECT p_partkey AS k,
        |    'chr' || (p_partkey % 5) AS chrom,
        |    CAST(p_partkey AS BIGINT) AS pos,
        |    CASE WHEN p_partkey % 7 = 0
        |         THEN 'rs' || p_partkey || ';rs' || (p_partkey + 100000)
        |         ELSE 'rs' || p_partkey END AS rs_id,
        |    (['A','C','G','T','AT'])[(p_partkey % 5) + 1] AS ref,
        |    CASE WHEN p_partkey % 3 = 0 THEN 'G,T'
        |         WHEN p_partkey % 3 = 1 THEN 'C' ELSE 'TA' END AS alt,
        |    CASE WHEN p_partkey % 11 = 0 THEN 'DP:GT'
        |         WHEN p_partkey % 13 = 0 THEN 'DP' ELSE 'GT:DP' END AS fmt
        |  FROM part),
        |sam AS (
        |  SELECT b.*, o.off, 'SM' || (o.off + 1) AS sample_id,
        |    CASE WHEN fmt LIKE '%GT%'
        |         THEN (['0/1','1|2','./.','0/0','1','.','0|2','2/1'])[((k + o.off) % 8) + 1]
        |         END AS g
        |  FROM base b CROSS JOIN (SELECT unnest([0, 1, 2]) AS off) o),
        |alle AS (
        |  SELECT *,
        |    CASE WHEN g IS NULL THEN '' ELSE regexp_extract(g, '^([^/|]+)', 1) END AS a1,
        |    CASE WHEN g IS NULL THEN '' ELSE regexp_extract(g, '^[^/|]+([/|])', 1) END AS sep,
        |    CASE WHEN g IS NULL THEN '' ELSE regexp_extract(g, '^[^/|]+[/|](.+)$', 1) END AS a2
        |  FROM sam),
        |enc AS (
        |  SELECT *,
        |    CASE WHEN a1 = '0' THEN ref
        |         WHEN regexp_matches(a1, '^[0-9]+$')
        |           THEN coalesce(string_split(alt, ',')[CAST(a1 AS INT)], '')
        |         ELSE '' END AS v1,
        |    CASE WHEN a2 = '0' THEN ref
        |         WHEN regexp_matches(a2, '^[0-9]+$')
        |           THEN coalesce(string_split(alt, ',')[CAST(a2 AS INT)], '')
        |         ELSE '' END AS v2,
        |    CASE WHEN a1 = '0' THEN 'R'
        |         WHEN regexp_matches(a1, '^[0-9]+$') THEN 'V' ELSE '' END AS f1,
        |    CASE WHEN a2 = '0' THEN 'R'
        |         WHEN regexp_matches(a2, '^[0-9]+$') THEN 'V' ELSE '' END AS f2
        |  FROM alle)
        |SELECT 'TPCH' AS trial_name, sample_id,
        |  unnest(string_split(rs_id, ';')) AS probeset_id,
        |  chrom, pos,
        |  CASE WHEN sep = '' THEN v1 ELSE v1 || sep || v2 END AS variant,
        |  CASE WHEN sep = '' THEN f1 ELSE f1 || sep || f2 END AS variant_format,
        |  CASE WHEN length(ref) = 1 AND len(string_split(alt, ',')) = 1
        |        AND length(string_split(alt, ',')[1]) = 1
        |       THEN 'SNV' ELSE 'DIV' END AS variant_type,
        |  CASE WHEN sep = '' THEN a1 = '0'
        |       ELSE (NOT regexp_matches(a1, '^[0-9]+$') OR a1 = '0')
        |        AND (NOT regexp_matches(a2, '^[0-9]+$') OR a2 = '0') END AS reference,
        |  CASE WHEN regexp_matches(a1, '^[0-9]+$') THEN CAST(a1 AS INT) END AS allele1,
        |  CASE WHEN regexp_matches(a2, '^[0-9]+$') THEN CAST(a2 AS INT) END AS allele2
        |FROM enc WHERE g IS NOT NULL""".stripMargin,

    "p5_vcf_info" ->
      """WITH base AS (
        |  SELECT 'chr' || (p_partkey % 5) AS chrom, CAST(p_partkey AS BIGINT) AS pos,
        |    'rs' || p_partkey AS rs_id,
        |    'DP=' || (p_partkey % 100) ||
        |    CASE WHEN p_partkey % 2 = 0
        |         THEN ';AF=0.' || (p_partkey % 9) || ',0.' || ((p_partkey + 3) % 9)
        |         ELSE '' END ||
        |    CASE WHEN p_partkey % 3 = 0 THEN ';VT=SNP' ELSE '' END ||
        |    CASE WHEN p_partkey % 10 = 0 THEN ';DB=0'
        |         WHEN p_partkey % 5 = 0 THEN ';DB' ELSE '' END AS info
        |  FROM part),
        |fields AS (
        |  SELECT chrom, pos, rs_id, 'DP' AS info_id, 'Integer' AS info_type,
        |    regexp_extract(info, '(^|;)DP=([^;]*)', 2) AS raw FROM base
        |  UNION ALL
        |  SELECT chrom, pos, rs_id, 'AF', 'Float',
        |    CASE WHEN regexp_matches(info, '(^|;)AF=')
        |         THEN regexp_extract(info, '(^|;)AF=([^;]*)', 2) END FROM base
        |  UNION ALL
        |  SELECT chrom, pos, rs_id, 'VT', 'String',
        |    CASE WHEN regexp_matches(info, '(^|;)VT=')
        |         THEN regexp_extract(info, '(^|;)VT=([^;]*)', 2) END FROM base
        |  UNION ALL
        |  SELECT chrom, pos, rs_id, 'DB', 'Flag',
        |    CASE WHEN regexp_matches(info, '(^|;)DB=')
        |         THEN regexp_extract(info, '(^|;)DB=([^;]*)', 2)
        |         WHEN regexp_matches(info, '(^|;)DB(;|$)') THEN '1' END FROM base),
        |vals AS (
        |  SELECT chrom, pos, rs_id, info_id, info_type,
        |    generate_subscripts(string_split(raw, ','), 1) - 1 AS value_idx,
        |    unnest(string_split(raw, ',')) AS value
        |  FROM fields WHERE raw IS NOT NULL)
        |SELECT chrom, pos, rs_id, info_id, info_type,
        |  CAST(value_idx AS INT) AS value_idx, value,
        |  CASE WHEN info_type IN ('Integer', 'Flag') THEN CAST(value AS BIGINT) END AS int_value,
        |  CASE WHEN info_type = 'Float' THEN CAST(value AS DOUBLE) END AS float_value,
        |  CASE WHEN info_type IN ('Character', 'String') THEN value END AS text_value
        |FROM vals""".stripMargin,

    "fn_metadata_xml" -> {
      val T = graft.functions.MetadataXml.Template
      s"""WITH n AS (
         |  SELECT n_nationkey AS k,
         |    CASE WHEN n_nationkey % 5 = 0 THEN 'Baseline'
         |         WHEN n_nationkey % 5 = 1 THEN 'Week ' || (n_nationkey - 12)
         |         WHEN n_nationkey % 5 = 2
         |           THEN n_nationkey || ' days ' || (n_nationkey % 12) || ' hours'
         |         WHEN n_nationkey % 5 = 3 THEN 'not a timepoint'
         |         ELSE 'Month ' || n_nationkey END AS display_name,
         |    CASE WHEN n_nationkey % 3 = 0 THEN 'N' ELSE 'T' END AS data_type,
         |    CASE WHEN n_nationkey % 2 = 0 THEN 'TIMEPOINT' END AS valuetype_cd,
         |    CASE WHEN n_nationkey % 5 = 0 THEN 0
         |         WHEN n_nationkey % 5 = 1 THEN (n_nationkey - 12) * 10080
         |         WHEN n_nationkey % 5 = 2
         |           THEN n_nationkey * 1440 + (n_nationkey % 12) * 60
         |         WHEN n_nationkey % 5 = 3 THEN NULL
         |         ELSE n_nationkey * 43200 END AS mins
         |  FROM nation)
         |SELECT k AS id, display_name, data_type, valuetype_cd,
         |  CASE WHEN valuetype_cd = 'TIMEPOINT' THEN
         |    CASE WHEN mins IS NULL THEN NULL
         |         ELSE '$T<SeriesMeta><Value>' || CAST(CAST(mins AS BIGINT) AS VARCHAR)
         |           || '</Value><Unit>minutes</Unit><DisplayName>' || display_name
         |           || '</DisplayName></SeriesMeta></ValueMetadata>' END
         |  WHEN data_type = 'N' THEN '$T</ValueMetadata>'
         |  END AS metadataxml
         |FROM n""".stripMargin
    },

    "security_ops" ->
      """WITH existing AS (
        |  SELECT DISTINCT 'ST' || (c_custkey % 40) AS accession,
        |    'Old ' || (c_custkey % 40) AS title,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'EXP:STUDY_A'
        |         ELSE 'EXP:PUBLIC' END AS secure_obj_token
        |  FROM customer),
        |incoming AS (
        |  SELECT 'ST' || n_nationkey AS accession, 'New ' || n_nationkey AS title,
        |    'EXP:STUDY_A' AS secure_obj_token
        |  FROM nation),
        |up AS (
        |  SELECT e.* FROM existing e
        |  WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.accession = e.accession)
        |  UNION ALL SELECT * FROM incoming)
        |SELECT accession, title,
        |  CASE WHEN secure_obj_token = 'EXP:STUDY_A' THEN 'EXP:STUDY_B'
        |       ELSE secure_obj_token END AS secure_obj_token
        |FROM up""".stripMargin,

    "node_ops" ->
      """WITH geo AS (
        |  SELECT r_name, n_name, n_nationkey
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |nodes AS (
        |  SELECT DISTINCT '\T\' AS c_fullname, 1 AS c_hlevel, 'T' AS c_name FROM geo
        |  UNION SELECT DISTINCT '\T\' || r_name || '\', 2, r_name FROM geo
        |  UNION SELECT DISTINCT '\T\' || r_name || '\' || n_name || '\', 3, n_name FROM geo),
        |i0 AS (
        |  SELECT c_fullname, c_hlevel, c_name,
        |    substring(md5(c_fullname), 1, 16) AS c_basecode
        |  FROM nodes),
        |f0 AS (
        |  SELECT substring(md5('\T\' || r_name || '\' || n_name || '\'), 1, 16) AS concept_cd,
        |    c_custkey
        |  FROM customer JOIN geo ON c_nationkey = n_nationkey),
        |newp AS (SELECT unnest(['\T\Extra\', '\T\AFRICA\ALGERIA\']) AS p),
        |repl AS (SELECT DISTINCT c_basecode FROM i0 JOIN newp ON c_fullname = p),
        |i1 AS (
        |  SELECT * FROM i0 WHERE c_fullname NOT IN (SELECT p FROM newp)
        |  UNION ALL
        |  SELECT '\T\Extra\', 2, 'Extra', substring(md5('\T\Extra\'), 1, 16)
        |  UNION ALL
        |  SELECT '\T\AFRICA\ALGERIA\', 3, 'ALGERIA',
        |    substring(md5('\T\AFRICA\ALGERIA\'), 1, 16)),
        |f1 AS (
        |  SELECT * FROM f0
        |  WHERE concept_cd NOT IN (SELECT c_basecode FROM repl)),
        |vict AS (
        |  SELECT c_fullname, c_basecode FROM i1
        |  WHERE c_fullname = '\T\AMERICA\BRAZIL\'),
        |i2 AS (SELECT * FROM i1 WHERE c_fullname NOT IN (SELECT c_fullname FROM vict)),
        |f2 AS (SELECT * FROM f1 WHERE concept_cd NOT IN (SELECT c_basecode FROM vict)),
        |fc AS (SELECT concept_cd, CAST(count(*) AS BIGINT) AS n FROM f2 GROUP BY 1)
        |SELECT i.c_fullname, CAST(i.c_hlevel AS BIGINT) AS c_hlevel, i.c_name,
        |  i.c_basecode, coalesce(fc.n, 0) AS n_facts
        |FROM i2 i LEFT JOIN fc ON i.c_basecode = fc.concept_cd""".stripMargin,
  )

  val remaining: Map[String, String] = Map(
    "f3_tag_substitution" ->
      """SELECT p_partkey, p_brand,
        |  CASE WHEN length(coalesce(p_brand, '')) > 0
        |       THEN replace('Parts+$$BRAND+Sized', '$$BRAND', p_brand) END AS category_cd,
        |  replace(CASE WHEN length(coalesce(p_brand, '')) > 0
        |       THEN replace('Parts+$$BRAND+Sized', '$$BRAND', p_brand) END,
        |    '+', '\') AS category_path
        |FROM part WHERE length(coalesce(p_brand, '')) > 0""".stripMargin,

    "f5_visit_suppress" ->
      """SELECT event_id, event_type,
        |  CASE WHEN n_visits = 1 THEN NULL
        |       WHEN visit_name = event_type THEN NULL
        |       ELSE visit_name END AS visit_name_out
        |FROM (SELECT event_id, event_type,
        |        json_extract_string(props, '$.k') AS visit_name,
        |        count(DISTINCT json_extract_string(props, '$.k'))
        |          OVER (PARTITION BY event_type) AS n_visits
        |      FROM events)""".stripMargin,

    "a6_probe_avg" ->
      """SELECT p_partkey, s_suppkey,
        |  round(avg(l_extendedprice), 4) AS avg_intensity, count(*) AS n_probes
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2""".stripMargin,

    "a11_min_record" ->
      "SELECT l_partkey, min(l_orderkey) AS min_record_id FROM lineitem GROUP BY 1",

    "fn_replace_last" ->
      """WITH nodes AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS node_id,
        |    '\Public Studies\' || r_name || '\' || n_name || '\' AS c_fullname
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |parts AS (
        |  SELECT node_id, c_fullname,
        |    list_filter(string_split(c_fullname, '\'), x -> len(x) > 0) AS p
        |  FROM nodes)
        |SELECT node_id, c_fullname,
        |  '\' || array_to_string(p[1:len(p)-1], '\') ||
        |  CASE WHEN len(p) > 1 THEN '\' ELSE '' END ||
        |  'Node ' || node_id || '\' AS renamed
        |FROM parts""".stripMargin,

    "w4_window_agg" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |  count(*) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1, 2""".stripMargin,

    "seq_surrogate_ids" ->
      """SELECT c_custkey, c_name,
        |  row_number() OVER (ORDER BY c_name, c_custkey) AS patient_num
        |FROM customer""".stripMargin,

    "pipeline_clinical_e2e" ->
      """WITH segf AS (
        |  SELECT c_name, c_mktsegment AS seg FROM customer
        |  WHERE length(coalesce(c_mktsegment, '')) > 0),
        |balf AS (
        |  SELECT c_name FROM customer
        |  WHERE length(coalesce(CAST(c_acctbal AS VARCHAR), '')) > 0),
        |nodes AS (
        |  SELECT '\Public Studies\' AS p, c_name FROM segf
        |  UNION ALL SELECT '\Public Studies\TPCH\', c_name FROM segf
        |  UNION ALL SELECT '\Public Studies\TPCH\Customers\', c_name FROM segf
        |  UNION ALL SELECT '\Public Studies\TPCH\Customers\Demographics\', c_name FROM segf
        |  UNION ALL SELECT '\Public Studies\TPCH\Customers\Demographics\Market Segment\', c_name FROM segf
        |  UNION ALL SELECT '\Public Studies\TPCH\Customers\Demographics\Market Segment\' || seg || '\', c_name FROM segf
        |  UNION ALL SELECT '\Public Studies\', c_name FROM balf
        |  UNION ALL SELECT '\Public Studies\TPCH\', c_name FROM balf
        |  UNION ALL SELECT '\Public Studies\TPCH\Customers\', c_name FROM balf
        |  UNION ALL SELECT '\Public Studies\TPCH\Customers\Demographics\', c_name FROM balf
        |  UNION ALL SELECT '\Public Studies\TPCH\Customers\Demographics\Account Balance\', c_name FROM balf)
        |SELECT p AS c_fullname, count(DISTINCT c_name) AS patient_count
        |FROM nodes GROUP BY 1""".stripMargin,

    "pipeline_omics_e2e" ->
      """WITH assays AS (
        |  SELECT s_name AS sample_id, s_suppkey,
        |    row_number() OVER (ORDER BY s_name) AS assay_id
        |  FROM supplier),
        |avgd AS (
        |  SELECT CAST(l_partkey AS VARCHAR) AS probeset_id, assay_id,
        |    round(avg(l_extendedprice), 6) AS iv
        |  FROM lineitem JOIN assays ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |logs AS (
        |  SELECT probeset_id, assay_id, iv AS raw_intensity,
        |    ln(iv) / ln(2.0) AS log_intensity
        |  FROM avgd),
        |calcs AS (
        |  SELECT probeset_id, median(log_intensity) AS med,
        |    stddev_samp(log_intensity) AS sd
        |  FROM logs GROUP BY 1)
        |SELECT l.probeset_id, CAST(l.assay_id AS BIGINT) AS assay_id,
        |  round(raw_intensity, 4) + 0.0 AS raw_intensity,
        |  round(log_intensity, 6) + 0.0 AS log_intensity,
        |  round(CASE WHEN sd IS NULL OR sd = 0 THEN 0
        |    ELSE least(greatest((log_intensity - med) / sd, -2.5), 2.5) END, 4) + 0.0 AS zscore
        |FROM logs l JOIN calcs c ON l.probeset_id = c.probeset_id""".stripMargin,
  )

  /** Old/new fact frames for the §2.10 merge-verb oracles — must mirror
    * MergeQueries.oldFacts/newFacts exactly. */
  private val MergeCtes =
    """WITH old AS (
      |  SELECT CAST(o_custkey AS VARCHAR) AS usubjid,
      |    'S/' || o_orderpriority AS leaf_node,
      |    o_orderstatus AS data_label,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 'N' ELSE 'T' END AS valtype_cd,
      |    CASE WHEN o_custkey % 10 < 8 THEN 'STUDY_A' ELSE 'STUDY_B' END AS sourcesystem_cd,
      |    CAST(o_orderkey % 100 AS BIGINT) AS nval
      |  FROM orders),
      |new AS (
      |  SELECT CAST(o_custkey AS VARCHAR) AS usubjid,
      |    'S/' || o_orderpriority AS leaf_node,
      |    o_orderstatus AS data_label,
      |    CASE WHEN o_orderkey % 2 = 0 THEN 'N' ELSE 'T' END AS valtype_cd,
      |    'STUDY_A' AS sourcesystem_cd,
      |    CAST(o_orderkey % 100 + 1000 AS BIGINT) AS nval
      |  FROM orders WHERE o_orderkey % 7 = 0 AND o_custkey % 10 < 8)
      |""".stripMargin

  // ---- I2B2_LOAD_SAMPLES oracle: mirrors pipeline.LoadSamples over the
  // ---- synthesized frames of OmicsQueries (suppliers=samples,
  // ---- regions=platforms). Generated with helpers so the five node CTEs
  // ---- and the guarded join conditions stay consistent.

  /** Substituted ontology path for a category prefix expression. */
  private def lsPath(prefix: String): String =
    s"""'\\Studies\\TPCH\\' || regexp_replace(replace(replace(replace(replace(replace(replace(
       |      $prefix,
       |      'PLATFORM', coalesce(title,'')), 'ATTR1', coalesce(attribute_1,'')),
       |      'ATTR2', coalesce(attribute_2,'')), 'TISSUETYPE', coalesce(tissue_type,'')),
       |      '+', '\\'), '_', ' ') || '\\', '(\\\\){2,}', '\\\\', 'g')""".stripMargin

  private val LsAttrCols = Seq("PLATFORM" -> "platform", "TISSUETYPE" -> "tissue_type",
    "ATTR1" -> "attribute_1", "ATTR2" -> "attribute_2")

  /** One typed-node CTE body (PLATFORM/TISSUETYPE/ATTR1/ATTR2). */
  private def lsTypedNode(ph: String, extra: String): String = {
    val pre = s"substr(category_cd, 1, instr(category_cd, '$ph') + ${ph.length})"
    val cols = LsAttrCols.map { case (oph, c) =>
      if (oph == ph) c
      else s"CASE WHEN instr($pre, '$oph') > 1 THEN $c ELSE '' END AS $c"
    }.mkString(",\n      ")
    s"""SELECT DISTINCT ${lsPath(pre)} AS leaf_node,
       |      $pre AS category_cd,
       |      $cols,
       |      '$ph' AS node_type
       |    FROM nvt WHERE category_cd LIKE '%$ph%'$extra""".stripMargin
  }

  /** Guarded attribute conditions of one typed LEFT JOIN in the mapping. */
  private def lsJoinGuards(ph: String, alias: String): String = {
    val pre = s"substr(a.category_cd, 1, instr(a.category_cd, '$ph') + ${ph.length})"
    LsAttrCols.filter(_._1 != ph).map { case (oph, c) =>
      s"    AND (CASE WHEN instr($pre, '$oph') > 1 THEN a.$c ELSE '' END) = coalesce($alias.$c, '')"
    }.mkString("\n")
  }

  private val LsCtes =
    s"""WITH smap AS (
       |  SELECT CASE WHEN s_suppkey % 3 = 0 THEN '' ELSE 'SITE' || (s_suppkey % 3) END AS site_id,
       |    s_name AS subject_id,
       |    'SMP' || s_suppkey AS sample_cd,
       |    'GPL' || (s_suppkey % 4) AS platform,
       |    CASE WHEN s_suppkey % 2 = 0 THEN 'Liver' ELSE 'Blood' END AS tissue_type,
       |    CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE 'FFPE_' || (s_suppkey % 2) END AS attribute_1,
       |    CAST(NULL AS VARCHAR) AS attribute_2,
       |    CASE WHEN s_suppkey % 2 = 0 THEN 'Biomarker_Data+PLATFORM+TISSUETYPE+ATTR1'
       |         ELSE 'Biomarker_Data+TISSUETYPE+PLATFORM' END AS category_cd
       |  FROM supplier),
       |pats AS (
       |  SELECT CAST(s_suppkey AS BIGINT) AS patient_num,
       |    regexp_replace('TPCH' || ':' ||
       |      (CASE WHEN s_suppkey % 3 = 0 THEN '' ELSE 'SITE' || (s_suppkey % 3) END)
       |      || ':' || s_name, ':{2,}', ':', 'g') AS sourcesystem_cd
       |  FROM supplier WHERE s_suppkey % 17 <> 0),
       |nv AS (
       |  SELECT DISTINCT category_cd, coalesce(platform, 'GPL570') AS platform,
       |    coalesce(tissue_type, 'Unspecified Tissue Type') AS tissue_type,
       |    attribute_1, attribute_2
       |  FROM smap),
       |nvt AS (
       |  SELECT nv.*, g.title FROM nv LEFT JOIN
       |    (SELECT 'GPL' || r_regionkey AS platform, 'Chip ' || r_name AS title
       |     FROM region WHERE upper(CASE WHEN r_regionkey = 2 THEN 'SNP' ELSE 'Gene Expression' END) = 'GENE EXPRESSION') g
       |    USING (platform)),
       |nodes AS (
       |  SELECT n.*, substring(md5(leaf_node), 1, 16) AS concept_cd FROM (
       |    SELECT DISTINCT ${lsPath("category_cd")} AS leaf_node,
       |      category_cd, platform, tissue_type, attribute_1, attribute_2,
       |      'LEAF' AS node_type
       |    FROM nvt
       |    UNION ALL ${lsTypedNode("PLATFORM", "")}
       |    UNION ALL ${lsTypedNode("TISSUETYPE", "")}
       |    UNION ALL ${lsTypedNode("ATTR1", " AND attribute_1 IS NOT NULL")}
       |    UNION ALL ${lsTypedNode("ATTR2", " AND attribute_2 IS NOT NULL")}) n),
       |m AS (
       |  SELECT p.patient_num AS patient_id, a.site_id, a.subject_id, a.sample_cd,
       |    ln.concept_cd AS concept_code,
       |    a.attribute_1 AS sample_type, a1.concept_cd AS sample_type_cd,
       |    'TPCH' AS trial_name,
       |    a.attribute_2 AS timepoint, a2.concept_cd AS timepoint_cd,
       |    ln.tissue_type AS tissue_type, ttp.concept_cd AS tissue_type_cd,
       |    pn.concept_cd AS platform_cd,
       |    ln.concept_cd || '-' || CAST(p.patient_num AS VARCHAR) AS data_uid,
       |    a.platform AS gpl_id, a.category_cd
       |  FROM smap a
       |  JOIN pats p ON regexp_replace('TPCH' || ':' || coalesce(a.site_id, '')
       |    || ':' || a.subject_id, ':{2,}', ':', 'g') = p.sourcesystem_cd
       |  JOIN nodes ln ON ln.node_type = 'LEAF'
       |    AND a.platform = ln.platform AND a.tissue_type = ln.tissue_type
       |    AND coalesce(a.attribute_1, '') = coalesce(ln.attribute_1, '')
       |    AND coalesce(a.attribute_2, '') = coalesce(ln.attribute_2, '')
       |  LEFT JOIN nodes pn ON pn.node_type = 'PLATFORM' AND a.platform = pn.platform
       |${lsJoinGuards("PLATFORM", "pn")}
       |  LEFT JOIN nodes ttp ON ttp.node_type = 'TISSUETYPE' AND a.tissue_type = ttp.tissue_type
       |${lsJoinGuards("TISSUETYPE", "ttp")}
       |  LEFT JOIN nodes a1 ON a1.node_type = 'ATTR1' AND a.attribute_1 = a1.attribute_1
       |${lsJoinGuards("ATTR1", "a1")}
       |  LEFT JOIN nodes a2 ON a2.node_type = 'ATTR2' AND a.attribute_2 = a2.attribute_2
       |${lsJoinGuards("ATTR2", "a2")})
       |""".stripMargin

  val merges: Map[String, String] = Map(
    "load_samples_mapping" -> (LsCtes + "SELECT * FROM m"),

    "load_samples_facts" -> (LsCtes +
      """SELECT DISTINCT patient_id AS patient_num, concept_code AS concept_cd,
        |  trial_name AS modifier_cd, 'T' AS valtype_cd, 'E' AS tval_char,
        |  trial_name AS sourcesystem_cd
        |FROM m""".stripMargin),

    // Mirrors AnnotationRegistry.load over the synthesized frames of
    // OmicsQueries: organism refresh -> NOT-EXISTS probeset insert with
    // deterministic ids -> registry join -> gene_id/gene_symbol backfills.
    "annotation_registry" ->
      """WITH staged AS (
        |  SELECT DISTINCT 'GPL1' AS gpl_id, 'P' || p_partkey AS probe_id,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE 'G' || (p_partkey % 50) END AS gene_symbol,
        |    CASE WHEN p_partkey % 3 = 0 THEN NULL ELSE CAST(p_partkey % 200 AS VARCHAR) END AS gene_id,
        |    CASE WHEN p_partkey % 4 = 0 THEN NULL
        |         WHEN p_partkey % 4 = 1 THEN 'Homo sapiens'
        |         ELSE 'Mus musculus' END AS organism
        |  FROM part),
        |existing AS (
        |  SELECT CAST(p_partkey AS BIGINT) AS probeset_id, 'P' || p_partkey AS probeset,
        |    'GPL1' AS platform, 'Homo sapiens' AS organism
        |  FROM part WHERE p_partkey % 2 = 0),
        |refreshed AS (
        |  SELECT e.probeset_id, e.probeset, e.platform,
        |    CASE WHEN s.gpl_id IS NOT NULL THEN s.organism ELSE e.organism END AS organism
        |  FROM existing e LEFT JOIN
        |    (SELECT gpl_id, probe_id, min(organism) AS organism
        |     FROM staged GROUP BY 1, 2) s
        |    ON e.platform = s.gpl_id AND e.probeset = s.probe_id),
        |cand AS (
        |  SELECT DISTINCT probe_id AS probeset,
        |    coalesce(organism, 'Homo sapiens') AS organism, gpl_id AS platform
        |  FROM staged),
        |fresh AS (
        |  SELECT c.* FROM cand c WHERE NOT EXISTS (
        |    SELECT 1 FROM refreshed r
        |    WHERE r.platform = c.platform AND r.probeset = c.probeset
        |      AND coalesce(r.organism, 'Homo sapiens') = c.organism)),
        |registry AS (
        |  SELECT probeset_id, probeset, platform, organism FROM refreshed
        |  UNION ALL
        |  SELECT (SELECT coalesce(max(probeset_id), 0) FROM refreshed)
        |      + row_number() OVER (ORDER BY platform, probeset, organism),
        |    probeset, platform, organism
        |  FROM fresh),
        |annotated AS (
        |  SELECT DISTINCT s.gpl_id, s.probe_id, s.gene_symbol,
        |    CAST(s.gene_id AS BIGINT) AS gene_id, r.probeset_id,
        |    coalesce(s.organism, 'Homo sapiens') AS organism
        |  FROM staged s JOIN registry r
        |    ON s.probe_id = r.probeset AND s.gpl_id = r.platform
        |   AND coalesce(s.organism, 'Homo sapiens') = coalesce(r.organism, 'Homo sapiens')),
        |genes AS (
        |  SELECT 'G' || (s_suppkey % 50) AS bio_marker_name,
        |    CASE WHEN s_suppkey % 2 = 0 THEN 'HOMO SAPIENS' ELSE 'Mus musculus' END AS organism,
        |    CAST(s_suppkey % 200 AS VARCHAR) AS primary_external_id,
        |    CASE WHEN s_suppkey % 10 = 0 THEN 'PROTEIN' ELSE 'gene' END AS bio_marker_type
        |  FROM supplier),
        |gonly AS (SELECT * FROM genes WHERE upper(bio_marker_type) = 'GENE'),
        |idbysym AS (
        |  SELECT bio_marker_name AS sym, upper(organism) AS org,
        |    min(CAST(primary_external_id AS BIGINT)) AS gid
        |  FROM gonly GROUP BY 1, 2),
        |symbyid AS (
        |  SELECT CAST(primary_external_id AS BIGINT) AS gid, upper(organism) AS org,
        |    min(bio_marker_name) AS sym
        |  FROM gonly GROUP BY 1, 2)
        |SELECT a.gpl_id, a.probe_id,
        |  coalesce(a.gene_symbol, s2.sym) AS gene_symbol,
        |  coalesce(a.gene_id, i.gid) AS gene_id,
        |  a.probeset_id, a.organism
        |FROM annotated a
        |LEFT JOIN idbysym i ON a.gene_id IS NULL AND a.gene_symbol IS NOT NULL
        |  AND a.gene_symbol = i.sym AND upper(a.organism) = i.org
        |LEFT JOIN symbyid s2 ON a.gene_symbol IS NULL AND a.gene_id IS NOT NULL
        |  AND a.gene_id = s2.gid AND upper(a.organism) = s2.org""".stripMargin,

    "merge_replace" -> (MergeCtes +
      """SELECT * FROM old WHERE sourcesystem_cd <> 'STUDY_A'
        |UNION ALL SELECT * FROM new""".stripMargin),

    "merge_update" -> (MergeCtes +
      """SELECT * FROM old WHERE sourcesystem_cd <> 'STUDY_A'
        |UNION ALL
        |SELECT * FROM old WHERE sourcesystem_cd = 'STUDY_A'
        |  AND usubjid NOT IN (SELECT DISTINCT usubjid FROM new)
        |UNION ALL SELECT * FROM new""".stripMargin),

    "merge_append" -> (MergeCtes +
      """SELECT * FROM old WHERE sourcesystem_cd <> 'STUDY_A'
        |UNION ALL
        |SELECT o.* FROM old o WHERE o.sourcesystem_cd = 'STUDY_A'
        |  AND NOT EXISTS (SELECT 1 FROM new n WHERE n.valtype_cd = 'N'
        |    AND n.usubjid = o.usubjid AND n.leaf_node = o.leaf_node)
        |UNION ALL SELECT * FROM new""".stripMargin),

    "study_move" ->
      """WITH nodes AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS node_id,
        |    '\Public Studies\' || r_name || '\' || n_name || '\' AS c_fullname
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |moved AS (
        |  SELECT node_id,
        |    CASE WHEN starts_with(c_fullname, '\Public Studies\AMERICA\')
        |         THEN '\Archive\2026\AMERICA Moved\' ||
        |              substr(c_fullname, len('\Public Studies\AMERICA\') + 1)
        |         ELSE c_fullname END AS c_fullname
        |  FROM nodes)
        |SELECT node_id, c_fullname,
        |  CAST(len(list_filter(string_split(c_fullname, '\'), x -> len(x) > 0)) AS INT)
        |    AS c_hlevel
        |FROM moved""".stripMargin,

    "study_delete" ->
      """SELECT CAST(c_custkey AS BIGINT) AS patient_num,
        |  '\Public Studies\' || r_name || '\' || n_name || '\' AS leaf_node
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE NOT starts_with('\Public Studies\' || r_name || '\' || n_name || '\',
        |  '\Public Studies\ASIA\')""".stripMargin,

    "merge_update_variables" -> (MergeCtes +
      """, victims AS (
        |  SELECT DISTINCT leaf_node FROM old
        |  WHERE regexp_matches(leaf_node, '^S/1-URGENT$')
        |     OR regexp_matches(leaf_node, '^S/5-LOW$'))
        |SELECT * FROM old
        |WHERE leaf_node NOT IN (SELECT leaf_node FROM victims)
        |UNION ALL
        |SELECT * FROM new WHERE leaf_node IN ('S/1-URGENT', 'S/5-LOW')""".stripMargin),
  )

  val trainingData: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    // 10-token segments; a repeated segment survives only in min(doc_id)
    "dedup_segments" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |segs AS (
        |  SELECT doc_id, i AS seg_idx,
        |    array_to_string(t[(i*10+1):((i+1)*10)], ' ') AS seg
        |  FROM toks, unnest(range(0, CAST(ceil(len(t) / 10.0) AS INT))) s(i)
        |  WHERE len(t) > 0),
        |owners AS (SELECT md5(seg) AS seg_hash, min(doc_id) AS keep_doc
        |           FROM segs GROUP BY 1),
        |m AS (SELECT doc_id, seg_idx, seg, (doc_id = keep_doc) AS kept
        |      FROM segs JOIN owners ON md5(seg) = seg_hash)
        |SELECT doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(CASE WHEN kept THEN seg END, ' ' ORDER BY seg_idx), '')
        |    AS clean_text
        |FROM m GROUP BY 1""".stripMargin,

    // content-defined segments: md5-divisibility cuts, running cut count
    // as the per-doc segment id, same ownership/reassembly as the fixed
    // stride form
    "dedup_cdc_segments" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos, unnest(t) AS tok
        |  FROM toks WHERE len(t) > 0),
        |cuts AS (
        |  SELECT doc_id, pos, tok,
        |    CASE WHEN CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 12 = 0
        |      THEN 1 ELSE 0 END AS cut
        |  FROM tok),
        |sg AS (
        |  SELECT doc_id, pos, tok,
        |    coalesce(sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS seg_idx
        |  FROM cuts),
        |segs AS (
        |  SELECT doc_id, seg_idx, string_agg(tok, ' ' ORDER BY pos) AS seg
        |  FROM sg GROUP BY 1, 2),
        |owners AS (SELECT md5(seg) AS seg_hash, min(doc_id) AS keep_doc
        |           FROM segs GROUP BY 1),
        |m AS (SELECT doc_id, seg_idx, seg, (doc_id = keep_doc) AS kept
        |      FROM segs JOIN owners ON md5(seg) = seg_hash)
        |SELECT doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
        |  coalesce(string_agg(CASE WHEN kept THEN seg END, ' ' ORDER BY seg_idx), '')
        |    AS clean_text
        |FROM m GROUP BY 1""".stripMargin,

    // canonical-URL dedup over the synthetic 4-variant URL groups
    "dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'https://' || b
        |      WHEN 1 THEN 'http://www.' || b || '/'
        |      WHEN 2 THEN 'HTTPS://' || b || '#section-2'
        |      ELSE 'https://' || b || '?utm_source=feed&utm_medium=rss' END AS url
        |  FROM (SELECT doc_id,
        |          'Example.COM/docs/page' || CAST(doc_id // 4 AS VARCHAR) AS b
        |        FROM documents)),
        |c AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(lower(url), '^https?://', ''), '^www\.', ''),
        |      '#.*$', ''), '\?utm_[a-z]+=[^&#]*(&utm_[a-z]+=[^&#]*)*$', ''),
        |      '/$', '') AS canonical_url
        |  FROM u)
        |SELECT canonical_url, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM c GROUP BY 1""".stripMargin,

    // C4-style line-level flags over the synthetic page layout (id
    // arithmetic both engines replay); line ratios from integer counts,
    // rounded to 4 dp BEFORE thresholding on both sides
    "text_c4_flags" ->
      """WITH pages AS (
        |  SELECT doc_id, concat_ws(chr(10), text,
        |    'this is sentence number ' || CAST(doc_id AS VARCHAR) || '.',
        |    CASE WHEN doc_id % 3 = 0 THEN 'too short' END,
        |    CASE WHEN doc_id % 7 = 0 THEN 'function() { return 1; }' END,
        |    CASE WHEN doc_id % 11 = 0 THEN 'Lorem Ipsum dolor sit amet.' END,
        |    CASE WHEN doc_id % 13 = 0
        |      THEN 'please enable javascript to continue.' END) AS page
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, page,
        |    list_filter(list_transform(string_split(page, chr(10)),
        |      x -> trim(x)), x -> len(x) > 0) AS lines
        |  FROM pages),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    round(len(list_filter(lines,
        |        x -> regexp_matches(x, '[.!?"'']$')))::DOUBLE
        |      / greatest(len(lines), 1), 4) AS terminal_line_frac,
        |    round(len(list_filter(lines,
        |        x -> len(list_filter(string_split_regex(x, '\s+'),
        |               w -> len(w) > 0)) < 3))::DOUBLE
        |      / greatest(len(lines), 1), 4) AS short_line_frac,
        |    contains(page, '{') AS has_curly,
        |    contains(lower(page), 'lorem ipsum') AS has_lorem,
        |    CAST(len(list_filter(lines,
        |      x -> contains(lower(x), 'javascript'))) AS BIGINT) AS n_js_lines
        |  FROM l)
        |SELECT doc_id, n_lines, terminal_line_frac, short_line_frac,
        |  has_curly, has_lorem, n_js_lines,
        |  (n_lines >= 2 AND terminal_line_frac >= 0.3
        |   AND short_line_frac <= 0.4 AND NOT has_curly AND NOT has_lorem
        |   AND n_js_lines = 0) AS passes
        |FROM m""".stripMargin,

    // Gopher-style quality flags; integer-derived ratios rounded to 4 dp
    // BEFORE thresholding on both sides
    "text_quality_flags" ->
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    CAST(len(t) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(t, x -> len(x))), 0) AS BIGINT)
        |      AS charsum,
        |    CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS BIGINT)
        |      AS alpha,
        |    CAST(len(list_filter(t, x -> list_contains(
        |      ['the','a','of','and','to','in','is','it'], x))) AS BIGINT) AS stop,
        |    CAST(len(text) - len(regexp_replace(text, '[#@~^|\\]', '', 'g'))
        |      AS BIGINT) AS sym
        |  FROM toks),
        |r AS (
        |  SELECT doc_id, n_words,
        |    round(charsum::DOUBLE / greatest(n_words, 1), 4) AS mean_word_len,
        |    round(sym::DOUBLE / greatest(n_words, 1), 4) AS symbol_ratio,
        |    round(alpha::DOUBLE / greatest(n_words, 1), 4) AS alpha_frac,
        |    round(stop::DOUBLE / greatest(n_words, 1), 4) AS stopword_frac
        |  FROM c)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
        |  stopword_frac,
        |  (n_words >= 10 AND n_words <= 100000
        |   AND mean_word_len >= 2.0 AND mean_word_len <= 10.0
        |   AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
        |   AND stopword_frac >= 0.0) AS passes
        |FROM r""".stripMargin,

    // smoothed tf-idf, rank on the ROUNDED score with term tiebreak
    "text_tfidf" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
        |      FROM scored)
        |SELECT doc_id, term, tf, df, tfidf, rank FROM r WHERE rank <= 5""".stripMargin,

    // Okapi BM25 (k1=1.2, b=0.75); avgdl = exact integer-sum mean
    "text_bm25" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY 1),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |g AS (SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
        |scored AS (
        |  SELECT doc_id, term, tf, df, dl,
        |    round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * (1.2 + 1.0)
        |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 6) AS bm25
        |  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
        |r AS (SELECT *, row_number() OVER
        |        (PARTITION BY doc_id ORDER BY bm25 DESC, term) AS rank
        |      FROM scored)
        |SELECT doc_id, term, tf, df, dl, bm25, rank FROM r WHERE rank <= 5""".stripMargin,

    // Laplace-smoothed unigram LM; per-term NLL fixed to integer
    // micro-bits so the per-doc sum is exact in both engines
    "text_perplexity" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term
        |  FROM documents),
        |cnt AS (SELECT term, count(*) AS cnt FROM terms GROUP BY 1),
        |g AS (SELECT sum(cnt)::BIGINT AS t_tokens, count(*)::BIGINT AS v_size FROM cnt),
        |scored AS (
        |  SELECT term,
        |    CAST(round(-log2((cnt + 1.0) / (t_tokens + v_size)) * 1e6) AS BIGINT)
        |      AS nll_micro
        |  FROM cnt CROSS JOIN g),
        |d AS (
        |  SELECT doc_id, count(*)::BIGINT AS dl, sum(nll_micro)::BIGINT AS nll_micro
        |  FROM terms JOIN scored USING (term) GROUP BY 1)
        |SELECT doc_id, dl, nll_micro,
        |  CAST(round(nll_micro * 1.0 / dl) AS BIGINT) / 1000000.0 AS cross_entropy,
        |  round(power(2.0,
        |    CAST(round(nll_micro * 1.0 / dl) AS BIGINT) / 1000000.0), 4) AS perplexity
        |FROM d""".stripMargin,

    // DSIR hashed-ngram importance weights; target = gopher-quality
    // passes (replayed inline); both LMs' log-probs fixed to integer
    // micro-bits per bucket so per-doc weights are exact integer sums
    "sample_dsir" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS qt
        |  FROM documents),
        |flags AS (
        |  SELECT doc_id,
        |    (CAST(len(qt) AS BIGINT) >= 10 AND CAST(len(qt) AS BIGINT) <= 100000
        |     AND round(CAST(coalesce(list_sum(list_transform(qt, x -> len(x))), 0)
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) >= 2.0
        |     AND round(CAST(coalesce(list_sum(list_transform(qt, x -> len(x))), 0)
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) <= 10.0
        |     AND round(CAST(len(text) - len(regexp_replace(text, '[#@~^|\\]', '', 'g'))
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) <= 0.1
        |     AND round(CAST(len(list_filter(qt, x -> regexp_matches(x, '[a-zA-Z]')))
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) >= 0.8) AS tgt
        |  FROM q),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |fb AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(unnest(list_concat(t,
        |      list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i + 1])))), 1, 4)) AS INTEGER) % 1024 AS bucket
        |  FROM toks),
        |j AS (SELECT fb.doc_id, fb.bucket, flags.tgt
        |      FROM fb JOIN flags USING (doc_id)),
        |cnt AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_raw,
        |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_tgt
        |  FROM j GROUP BY 1),
        |g AS (SELECT CAST(sum(cnt_raw) AS BIGINT) AS t_raw,
        |             CAST(sum(cnt_tgt) AS BIGINT) AS t_tgt FROM cnt),
        |sc AS (
        |  SELECT bucket,
        |    CAST(round(log2((cnt_tgt + 1.0) / (t_tgt + 1024)) * 1e6) AS BIGINT)
        |    - CAST(round(log2((cnt_raw + 1.0) / (t_raw + 1024)) * 1e6) AS BIGINT)
        |      AS delta_micro
        |  FROM cnt CROSS JOIN g)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |  CAST(sum(delta_micro) AS BIGINT) AS logw_micro,
        |  CAST(sum(delta_micro) AS BIGINT) > 0 AS keep
        |FROM j JOIN sc USING (bucket) GROUP BY 1""".stripMargin,

    // DSIR weights -> deterministic exponential race (log-form Gumbel):
    // same model replay as sample_dsir, then w = 2^clamp(logw, +-20),
    // key = ln(-ln u) - ln w in integer micro-units, doc_id tiebreak,
    // keep the ceil(0.2 n) smallest
    "sample_weighted" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS qt
        |  FROM documents),
        |flags AS (
        |  SELECT doc_id,
        |    (CAST(len(qt) AS BIGINT) >= 10 AND CAST(len(qt) AS BIGINT) <= 100000
        |     AND round(CAST(coalesce(list_sum(list_transform(qt, x -> len(x))), 0)
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) >= 2.0
        |     AND round(CAST(coalesce(list_sum(list_transform(qt, x -> len(x))), 0)
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) <= 10.0
        |     AND round(CAST(len(text) - len(regexp_replace(text, '[#@~^|\\]', '', 'g'))
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) <= 0.1
        |     AND round(CAST(len(list_filter(qt, x -> regexp_matches(x, '[a-zA-Z]')))
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) >= 0.8) AS tgt
        |  FROM q),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |fb AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(unnest(list_concat(t,
        |      list_transform(generate_series(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i + 1])))), 1, 4)) AS INTEGER) % 1024 AS bucket
        |  FROM toks),
        |j AS (SELECT fb.doc_id, fb.bucket, flags.tgt
        |      FROM fb JOIN flags USING (doc_id)),
        |cnt AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS cnt_raw,
        |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS cnt_tgt
        |  FROM j GROUP BY 1),
        |g AS (SELECT CAST(sum(cnt_raw) AS BIGINT) AS t_raw,
        |             CAST(sum(cnt_tgt) AS BIGINT) AS t_tgt FROM cnt),
        |sc AS (
        |  SELECT bucket,
        |    CAST(round(log2((cnt_tgt + 1.0) / (t_tgt + 1024)) * 1e6) AS BIGINT)
        |    - CAST(round(log2((cnt_raw + 1.0) / (t_raw + 1024)) * 1e6) AS BIGINT)
        |      AS delta_micro
        |  FROM cnt CROSS JOIN g),
        |scored AS (
        |  SELECT doc_id, CAST(sum(delta_micro) AS BIGINT) AS logw_micro
        |  FROM j JOIN sc USING (bucket) GROUP BY 1),
        |race AS (
        |  SELECT doc_id, logw_micro,
        |    CAST(round((ln(-ln((CAST(CAST(('0x' ||
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |        AS DOUBLE) + 0.5) / 4503599627370496.0))
        |      - ln(pow(2.0, greatest(least(logw_micro::DOUBLE / 1e6, 20.0),
        |          -20.0)))) * 1e6) AS BIGINT) AS race_micro
        |  FROM scored),
        |rk AS (
        |  SELECT doc_id, logw_micro, race_micro,
        |    CAST(row_number() OVER (ORDER BY race_micro, doc_id) AS BIGINT)
        |      AS sample_rank,
        |    count(*) OVER () AS n
        |  FROM race)
        |SELECT doc_id, logw_micro, race_micro, sample_rank
        |FROM rk WHERE sample_rank <= CAST(ceil(0.2 * n) AS BIGINT)""".stripMargin,

    // the round-10 curation chain end-to-end: quantile-gate replay ->
    // exact-fingerprint keep-one -> per-lang race ranks (the
    // sample_weighted_group contract over the gated unique survivors)
    "pipeline_curation_e2e" ->
      """WITH v AS (
        |  SELECT lang, n_chars AS v FROM documents),
        |b0 AS (
        |  SELECT lang, v, abs(v) AS a,
        |    CASE WHEN abs(v) < 128 THEN 0
        |         ELSE length(bin(abs(v))) - 1 - 7 END AS sh
        |  FROM v WHERE v IS NOT NULL),
        |b1 AS (
        |  SELECT lang, v, (1::BIGINT << sh) AS w,
        |    ((a // (1::BIGINT << sh)) << sh) AS l
        |  FROM b0),
        |g AS (
        |  SELECT lang,
        |    CASE WHEN v >= 0 THEN l ELSE -(l + w - 1) END AS blo,
        |    w AS bw, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b1 GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT lang, blo, bw, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY blo, bw
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cume,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM g),
        |q50 AS (
        |  SELECT lang,
        |    round(blo + (bw - 1)::DOUBLE * (tgt - (cume - cnt) - 1)::DOUBLE
        |      / greatest(cnt - 1, 1)::DOUBLE, 4) AS p50
        |  FROM (SELECT c.*,
        |          greatest(1::BIGINT, CAST(ceil(0.5 * n) AS BIGINT)) AS tgt
        |        FROM c) x
        |  WHERE cume - cnt < tgt AND tgt <= cume),
        |gated AS (
        |  SELECT d.lang, d.doc_id, d.text, d.n_chars
        |  FROM documents d JOIN q50 ON d.lang = q50.lang
        |  WHERE n_chars::DOUBLE >= p50),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM gated
        |  GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))),
        |uniq AS (SELECT gated.* FROM gated JOIN keep USING (doc_id)),
        |race AS (
        |  SELECT lang, doc_id,
        |    CAST(round((ln(-ln((CAST(CAST(('0x' ||
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |        AS DOUBLE) + 0.5) / 4503599627370496.0))
        |      - greatest(least(ln(n_chars::DOUBLE), 700.0), -700.0))
        |      * 1e6) AS BIGINT) AS race_micro
        |  FROM uniq WHERE n_chars IS NOT NULL AND n_chars > 0),
        |rk AS (
        |  SELECT lang, doc_id, race_micro,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY race_micro, CAST(doc_id AS VARCHAR)) AS BIGINT)
        |      AS sample_rank
        |  FROM race)
        |SELECT lang, sample_rank, doc_id, race_micro
        |FROM rk WHERE sample_rank <= 10""".stripMargin,

    // per-group weighted sampling: the sample_weighted race key with
    // weight = n_chars, ranked per lang (race asc, stringified-id
    // tiebreak — the topKPerGroup contract), exactly 10 winners per lang
    "sample_weighted_group" ->
      """WITH race AS (
        |  SELECT lang, doc_id,
        |    CAST(round((ln(-ln((CAST(CAST(('0x' ||
        |        substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT)
        |        AS DOUBLE) + 0.5) / 4503599627370496.0))
        |      - greatest(least(ln(n_chars::DOUBLE), 700.0), -700.0))
        |      * 1e6) AS BIGINT) AS race_micro
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |rk AS (
        |  SELECT lang, doc_id, race_micro,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY race_micro, CAST(doc_id AS VARCHAR)) AS BIGINT)
        |      AS sample_rank
        |  FROM race)
        |SELECT lang, sample_rank, doc_id, race_micro
        |FROM rk WHERE sample_rank <= 10""".stripMargin,

    // bounded top-k per group: result contract IS the row_number window
    // (score DESC, stringified-id tiebreak) — the Spark side merely
    // computes it with a k-capped aggregate instead of a window
    "topk_per_group" ->
      """SELECT lang, source, rank, doc_id, n_chars FROM (
        |  SELECT lang, source, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang, source
        |      ORDER BY n_chars DESC, CAST(doc_id AS VARCHAR)) AS BIGINT)
        |      AS rank
        |  FROM documents
        |  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL) t
        |WHERE rank <= 5""".stripMargin,

    // Stupid Backoff bigram LM trained on the gopher-quality subset,
    // scoring every doc; per-position NLL fixed to integer micro-bits
    "text_bigram_lm" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS qt
        |  FROM documents),
        |flags AS (
        |  SELECT doc_id,
        |    (CAST(len(qt) AS BIGINT) >= 10 AND CAST(len(qt) AS BIGINT) <= 100000
        |     AND round(CAST(coalesce(list_sum(list_transform(qt, x -> len(x))), 0)
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) >= 2.0
        |     AND round(CAST(coalesce(list_sum(list_transform(qt, x -> len(x))), 0)
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) <= 10.0
        |     AND round(CAST(len(text) - len(regexp_replace(text, '[#@~^|\\]', '', 'g'))
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) <= 0.1
        |     AND round(CAST(len(list_filter(qt, x -> regexp_matches(x, '[a-zA-Z]')))
        |           AS BIGINT)::DOUBLE / greatest(len(qt), 1), 4) >= 0.8) AS tgt
        |  FROM q),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |    i -> {'w1': t[i], 'w2': t[i + 1]}), recursive := true)
        |  FROM toks),
        |bic AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bi
        |  FROM bg JOIN flags USING (doc_id) WHERE tgt GROUP BY 1, 2),
        |unic AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c_uni
        |  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
        |  JOIN flags USING (doc_id) WHERE tgt GROUP BY 1),
        |g AS (SELECT CAST(sum(c_uni) AS BIGINT) AS t_tokens,
        |             CAST(count(*) AS BIGINT) AS v_size FROM unic),
        |nll AS (
        |  SELECT bg.doc_id, bic.c_bi IS NOT NULL AS seen,
        |    CASE WHEN bic.c_bi IS NOT NULL THEN
        |      CAST(round(-log2(bic.c_bi * 1.0 / u1.c_uni) * 1e6) AS BIGINT)
        |    ELSE
        |      CAST(round(-log2(0.4 * ((coalesce(u2.c_uni, 0) + 1.0)
        |        / (g.t_tokens + g.v_size + 1))) * 1e6) AS BIGINT)
        |    END AS nll_micro
        |  FROM bg
        |  LEFT JOIN bic ON bg.w1 = bic.w1 AND bg.w2 = bic.w2
        |  LEFT JOIN unic u1 ON bg.w1 = u1.w
        |  LEFT JOIN unic u2 ON bg.w2 = u2.w
        |  CROSS JOIN g),
        |d AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(CASE WHEN seen THEN 0 ELSE 1 END) AS BIGINT) AS n_backoff,
        |    CAST(sum(nll_micro) AS BIGINT) AS nll_micro
        |  FROM nll GROUP BY 1)
        |SELECT doc_id, n_bigrams, n_backoff, nll_micro,
        |  CAST(round(nll_micro * 1.0 / n_bigrams) AS BIGINT) / 1000000.0
        |    AS cross_entropy,
        |  round(power(2.0,
        |    CAST(round(nll_micro * 1.0 / n_bigrams) AS BIGINT) / 1000000.0), 4)
        |    AS perplexity
        |FROM d""".stripMargin,

    // deterministic HyperLogLog replay: md5 buckets, string-rank rho,
    // exact integer register sums; every float op mirrors the Spark side
    "sketch_hll_distinct" ->
      """WITH h AS (
        |  SELECT lang,
        |    CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 4096 AS bucket,
        |    regexp_replace(substr(md5(text), 5, 12), '^0+', '') AS stripped
        |  FROM documents),
        |r AS (
        |  SELECT lang, bucket,
        |    CASE WHEN len(stripped) = 0 THEN 49
        |      ELSE (12 - len(stripped)) * 4
        |        + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
        |               WHEN substr(stripped, 1, 1) IN ('2', '3') THEN 2
        |               WHEN substr(stripped, 1, 1) IN ('4', '5', '6', '7') THEN 1
        |               ELSE 0 END + 1 END AS rho
        |  FROM h),
        |regs AS (SELECT lang, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS m_used,
        |    CAST(sum(1::BIGINT << (50 - mj)) AS BIGINT) AS s_present
        |  FROM regs GROUP BY 1),
        |e AS (
        |  SELECT lang, m_used, 4096 - m_used AS v_empty,
        |    s_present + (4096 - m_used) * (1::BIGINT << 50) AS reg_sum
        |  FROM agg),
        |est AS (
        |  SELECT *, 0.7213 / (1.0 + 1.079 / 4096.0) * 4096 * 4096
        |    / (reg_sum / (1::BIGINT << 50)) AS est_raw FROM e)
        |SELECT lang, m_used, reg_sum,
        |  round(CASE WHEN est_raw <= 2.5 * 4096 AND v_empty > 0
        |    THEN 4096 * ln(4096.0 / v_empty) ELSE est_raw END, 4)
        |    AS est_distinct
        |FROM est""".stripMargin,

    // the HLL MERGE gate: the Spark side builds per-day register tables
    // and merges them; the merge is lossless (union + max), so the
    // oracle is the WHOLE-CORPUS replay — any merge bug breaks the hash
    "sketch_hll_merged" ->
      """WITH h AS (
        |  SELECT lang,
        |    CAST(('0x' || substr(md5(text), 1, 4)) AS INTEGER) % 4096 AS bucket,
        |    regexp_replace(substr(md5(text), 5, 12), '^0+', '') AS stripped
        |  FROM documents),
        |r AS (
        |  SELECT lang, bucket,
        |    CASE WHEN len(stripped) = 0 THEN 49
        |      ELSE (12 - len(stripped)) * 4
        |        + CASE WHEN substr(stripped, 1, 1) = '1' THEN 3
        |               WHEN substr(stripped, 1, 1) IN ('2', '3') THEN 2
        |               WHEN substr(stripped, 1, 1) IN ('4', '5', '6', '7') THEN 1
        |               ELSE 0 END + 1 END AS rho
        |  FROM h),
        |regs AS (SELECT lang, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS m_used,
        |    CAST(sum(1::BIGINT << (50 - mj)) AS BIGINT) AS s_present
        |  FROM regs GROUP BY 1),
        |e AS (
        |  SELECT lang, m_used, 4096 - m_used AS v_empty,
        |    s_present + (4096 - m_used) * (1::BIGINT << 50) AS reg_sum
        |  FROM agg),
        |est AS (
        |  SELECT *, 0.7213 / (1.0 + 1.079 / 4096.0) * 4096 * 4096
        |    / (reg_sum / (1::BIGINT << 50)) AS est_raw FROM e)
        |SELECT lang, m_used, reg_sum,
        |  round(CASE WHEN est_raw <= 2.5 * 4096 AND v_empty > 0
        |    THEN 4096 * ln(4096.0 / v_empty) ELSE est_raw END, 4)
        |    AS est_distinct
        |FROM est""".stripMargin,

    // the quantile-sketch merge gate: same lossless-merge argument, so
    // the oracle is the whole-corpus bucket/interpolation replay over
    // n_chars at q in (0.5, 0.9)
    "sketch_quantile_merged" ->
      """WITH v AS (
        |  SELECT lang, n_chars AS v FROM documents),
        |b0 AS (
        |  SELECT lang, v, abs(v) AS a,
        |    CASE WHEN abs(v) < 128 THEN 0
        |         ELSE length(bin(abs(v))) - 1 - 7 END AS sh
        |  FROM v WHERE v IS NOT NULL),
        |b1 AS (
        |  SELECT lang, v, (1::BIGINT << sh) AS w,
        |    ((a // (1::BIGINT << sh)) << sh) AS l
        |  FROM b0),
        |g AS (
        |  SELECT lang,
        |    CASE WHEN v >= 0 THEN l ELSE -(l + w - 1) END AS blo,
        |    w AS bw, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b1 GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT lang, blo, bw, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY blo, bw
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cume,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM g),
        |x AS (
        |  SELECT c.*, q,
        |    greatest(1::BIGINT, CAST(ceil(q * n) AS BIGINT)) AS tgt
        |  FROM c CROSS JOIN
        |    (SELECT unnest([0.5, 0.9]::DOUBLE[]) AS q) qs)
        |SELECT lang, q, n, blo AS lo,
        |  round(blo + (bw - 1)::DOUBLE * (tgt - (cume - cnt) - 1)::DOUBLE
        |    / greatest(cnt - 1, 1)::DOUBLE, 4) AS est
        |FROM x WHERE cume - cnt < tgt AND tgt <= cume""".stripMargin,

    // Bloom replay: double-hashed positions (h1 + i*h2 from one digest), bit_or words, all-k test
    "sketch_bloom_contains" ->
      """WITH bitsrc AS (
        |  SELECT unnest(list_transform([0, 1, 2, 3, 4], i ->
        |    CAST((CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT)
        |      + i * (CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT)
        |             * 2 + 1)) % 131072 AS INTEGER))) AS pos
        |  FROM documents),
        |words AS (
        |  SELECT CAST(pos // 63 AS INTEGER) AS word,
        |    bit_or(1::BIGINT << (pos % 63)) AS bits
        |  FROM bitsrc GROUP BY 1),
        |probes AS (
        |  SELECT doc_id, 'present' AS kind, text AS probe
        |  FROM documents WHERE doc_id % 499 = 0
        |  UNION ALL
        |  SELECT doc_id, 'control', 'unseen-' || doc_id
        |  FROM documents WHERE doc_id % 499 = 0),
        |pp AS (
        |  SELECT doc_id, kind,
        |    unnest(list_transform([0, 1, 2, 3, 4], i ->
        |      CAST((CAST(('0x' || substr(md5(probe), 1, 8)) AS BIGINT)
        |        + i * (CAST(('0x' || substr(md5(probe), 9, 8)) AS BIGINT)
        |               * 2 + 1)) % 131072 AS INTEGER))) AS pos
        |  FROM probes),
        |hits AS (
        |  SELECT doc_id, kind,
        |    CASE WHEN bits IS NOT NULL AND ((bits >> (pos % 63)) & 1) = 1
        |      THEN 1 ELSE 0 END AS hit
        |  FROM pp LEFT JOIN words
        |    ON CAST(pp.pos // 63 AS INTEGER) = words.word)
        |SELECT doc_id, kind, CAST(sum(hit) AS BIGINT) AS bits_set,
        |  sum(hit) = 5 AS maybe_member
        |FROM hits GROUP BY 1, 2""".stripMargin,

    // Count-Min replay: 16-bit digest-slice buckets, counter sums, min-over-rows
    // base-2 sub-bucketed quantile sketch: exact integer bucketing
    // (bin-string log2, shifts, //), cumulative ranks, and the one-IEEE-
    // division interpolation — replayed bit-for-bit
    "sketch_quantile" ->
      """WITH v AS (
        |  SELECT lang, CAST(length(text) AS BIGINT) AS v FROM documents),
        |b0 AS (
        |  SELECT lang, v, abs(v) AS a,
        |    CASE WHEN abs(v) < 128 THEN 0
        |         ELSE length(bin(abs(v))) - 1 - 7 END AS sh
        |  FROM v WHERE v IS NOT NULL),
        |b1 AS (
        |  SELECT lang, v, (1::BIGINT << sh) AS w,
        |    ((a // (1::BIGINT << sh)) << sh) AS l
        |  FROM b0),
        |g AS (
        |  SELECT lang,
        |    CASE WHEN v >= 0 THEN l ELSE -(l + w - 1) END AS blo,
        |    w AS bw, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b1 GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT lang, blo, bw, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY blo, bw
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cume,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM g),
        |x AS (
        |  SELECT c.*, q,
        |    greatest(1::BIGINT, CAST(ceil(q * n) AS BIGINT)) AS tgt
        |  FROM c CROSS JOIN
        |    (SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]::DOUBLE[]) AS q) qs)
        |SELECT lang, q, n, blo AS lo,
        |  round(blo + (bw - 1)::DOUBLE * (tgt - (cume - cnt) - 1)::DOUBLE
        |    / greatest(cnt - 1, 1)::DOUBLE, 4) AS est
        |FROM x WHERE cume - cnt < tgt AND tgt <= cume""".stripMargin,

    // same bucketing/interpolation replay as sketch_quantile (q = 0.5
    // over n_chars), then the gate: keep docs at or above their
    // language's sketched median, grouped back per language
    "sketch_quantile_gate" ->
      """WITH v AS (
        |  SELECT lang, n_chars AS v FROM documents),
        |b0 AS (
        |  SELECT lang, v, abs(v) AS a,
        |    CASE WHEN abs(v) < 128 THEN 0
        |         ELSE length(bin(abs(v))) - 1 - 7 END AS sh
        |  FROM v WHERE v IS NOT NULL),
        |b1 AS (
        |  SELECT lang, v, (1::BIGINT << sh) AS w,
        |    ((a // (1::BIGINT << sh)) << sh) AS l
        |  FROM b0),
        |g AS (
        |  SELECT lang,
        |    CASE WHEN v >= 0 THEN l ELSE -(l + w - 1) END AS blo,
        |    w AS bw, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b1 GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT lang, blo, bw, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY blo, bw
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cume,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM g),
        |q50 AS (
        |  SELECT lang,
        |    round(blo + (bw - 1)::DOUBLE * (tgt - (cume - cnt) - 1)::DOUBLE
        |      / greatest(cnt - 1, 1)::DOUBLE, 4) AS p50
        |  FROM (SELECT c.*,
        |          greatest(1::BIGINT, CAST(ceil(0.5 * n) AS BIGINT)) AS tgt
        |        FROM c) x
        |  WHERE cume - cnt < tgt AND tgt <= cume)
        |SELECT d.lang, p50, CAST(count(*) AS BIGINT) AS kept,
        |  CAST(min(n_chars) AS BIGINT) AS min_kept
        |FROM documents d JOIN q50 ON d.lang = q50.lang
        |WHERE n_chars::DOUBLE >= p50
        |GROUP BY 1, 2""".stripMargin,

    // hashed linear classifier: re-derive the 256-bucket md5 weight
    // table, map tokens via the hashing trick, fold LEFT from the bias
    // (list_reduce after list_prepend — the engine's sequential
    // accumulation order)
    "text_classifier_score" ->
      """WITH q AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |w AS (
        |  SELECT i,
        |    round(CAST(('0x' || substring(md5('w|' || CAST(i AS VARCHAR)), 1, 8))
        |      AS BIGINT)::DOUBLE / 4294967296 - 0.5, 6) AS wv
        |  FROM range(0, 256) r(i)),
        |warr AS (SELECT list(wv ORDER BY i) AS arr FROM w),
        |sc AS (
        |  SELECT doc_id,
        |    round(list_reduce(list_prepend(0.25::DOUBLE,
        |      list_transform(t, tok -> arr[
        |        CAST(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 256
        |          AS INT) + 1])),
        |      (a, b) -> a + b), 6) AS logit
        |  FROM q, warr)
        |SELECT doc_id, logit, (logit >= 0.0) AS keep FROM sc""".stripMargin,

    // unicode normalization replay: same injection, same ordered
    // replace chain (RE2 \x{...} classes; chr() for single-char maps)
    "text_normalize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    concat(
        |      CASE WHEN doc_id % 2 = 0 THEN chr(8220) || 'quoted' ||
        |        chr(8221) || chr(8230) || ' ' ELSE '' END,
        |      text,
        |      CASE WHEN doc_id % 3 = 0 THEN ' ' || chr(8212) || ' dash' ||
        |        chr(8203) || 'split' ELSE '' END,
        |      CASE WHEN doc_id % 5 = 0 THEN chr(160) || chr(160) ||
        |        'tail' || chr(9) || chr(9) || 'x' ELSE '' END) AS dirty
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, dirty,
        |    trim(regexp_replace(
        |      replace(
        |        replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(
        |                regexp_replace(
        |                  regexp_replace(dirty,
        |                    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |                  '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |                '[\x{2018}\x{2019}]', '''', 'g'),
        |              '[\x{201C}\x{201D}]', '"', 'g'),
        |            '[\x{2013}\x{2014}\x{2212}]', '-', 'g'),
        |          chr(8230), '...'),
        |        chr(160), ' '),
        |      '[ \t]+', ' ', 'g')) AS norm_text
        |  FROM d)
        |SELECT doc_id, norm_text, (norm_text <> dirty) AS changed FROM n""".stripMargin,

    // corpus health report: volumes + the qsketch p50 replay + the
    // exact-fingerprint dup rate, joined per lang
    "corpus_report" ->
      """WITH v AS (
        |  SELECT lang, n_chars AS v FROM documents),
        |b0 AS (
        |  SELECT lang, v, abs(v) AS a,
        |    CASE WHEN abs(v) < 128 THEN 0
        |         ELSE length(bin(abs(v))) - 1 - 7 END AS sh
        |  FROM v WHERE v IS NOT NULL),
        |b1 AS (
        |  SELECT lang, v, (1::BIGINT << sh) AS w,
        |    ((a // (1::BIGINT << sh)) << sh) AS l
        |  FROM b0),
        |g AS (
        |  SELECT lang,
        |    CASE WHEN v >= 0 THEN l ELSE -(l + w - 1) END AS blo,
        |    w AS bw, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b1 GROUP BY 1, 2, 3),
        |c AS (
        |  SELECT lang, blo, bw, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY blo, bw
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cume,
        |    CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM g),
        |q50 AS (
        |  SELECT lang,
        |    round(blo + (bw - 1)::DOUBLE * (tgt - (cume - cnt) - 1)::DOUBLE
        |      / greatest(cnt - 1, 1)::DOUBLE, 4) AS p50_chars
        |  FROM (SELECT c.*,
        |          greatest(1::BIGINT, CAST(ceil(0.5 * n) AS BIGINT)) AS tgt
        |        FROM c) x
        |  WHERE cume - cnt < tgt AND tgt <= cume),
        |base AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(CAST(ceil(n_chars::DOUBLE / 4.0) AS BIGINT)) AS BIGINT)
        |      AS est_tokens
        |  FROM documents GROUP BY 1),
        |fg AS (
        |  SELECT lang, md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
        |    AS fp, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |dups AS (
        |  SELECT lang, CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
        |    AS dup_docs
        |  FROM fg GROUP BY 1)
        |SELECT b.lang, n_docs, est_tokens, q50.p50_chars, dup_docs,
        |  round(dup_docs::DOUBLE / n_docs, 4) AS dup_rate
        |FROM base b JOIN q50 ON b.lang = q50.lang
        |JOIN dups ON b.lang = dups.lang""".stripMargin,

    // the CM filter is exact by construction (no false negatives +
    // exact recount), so the oracle is the PLAIN groupBy/HAVING with no
    // sketch internals — any CM bug that loses a heavy hitter fails here
    "sketch_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM toks)
        |SELECT term, CAST(count(*) AS BIGINT) AS exact_count
        |FROM toks GROUP BY 1
        |HAVING count(*) >= greatest(1,
        |  CAST(ceil(0.02 * (SELECT n FROM tot)) AS BIGINT))""".stripMargin,

    // replays the union-of-sketches rank math: bottom-64 of each pair's
    // distinct-hash union with per-side membership flags
    "sketch_kmv_jaccard" ->
      """WITH h AS (SELECT DISTINCT lang, md5(text) AS h FROM documents),
        |langs AS (SELECT DISTINCT lang FROM documents),
        |pairs AS (SELECT a.lang AS lang_a, b.lang AS lang_b
        |          FROM langs a JOIN langs b ON a.lang < b.lang),
        |uh AS (
        |  SELECT p.lang_a, p.lang_b, h.h,
        |    max(CASE WHEN h.lang = p.lang_a THEN 1 ELSE 0 END) AS ina,
        |    max(CASE WHEN h.lang = p.lang_b THEN 1 ELSE 0 END) AS inb
        |  FROM pairs p JOIN h ON h.lang IN (p.lang_a, p.lang_b)
        |  GROUP BY 1, 2, 3),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang_a, lang_b
        |        ORDER BY h) AS rn FROM uh),
        |agg AS (
        |  SELECT lang_a, lang_b, CAST(count(*) AS BIGINT) AS n_kept,
        |    max(h) AS kth_hash, CAST(sum(ina * inb) AS BIGINT) AS both_cnt
        |  FROM r WHERE rn <= 64 GROUP BY 1, 2),
        |est AS (
        |  SELECT *,
        |    round(CASE WHEN n_kept < 64 THEN n_kept * 1.0
        |      ELSE 63 / (CAST(('0x' || substr(kth_hash, 1, 13)) AS BIGINT)
        |                 / (1::BIGINT << 52)) END, 4) AS est_union,
        |    round(both_cnt * 1.0 / n_kept, 4) AS est_jaccard
        |  FROM agg)
        |SELECT lang_a, lang_b, n_kept, kth_hash, both_cnt, est_union,
        |  est_jaccard, round(est_jaccard * est_union, 4) AS est_intersection
        |FROM est""".stripMargin,

    "sketch_cm_tokens" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> len(x) > 0)) AS term
        |  FROM documents),
        |js AS (SELECT unnest([0, 1, 2, 3]) AS j),
        |rb AS (
        |  SELECT j AS row,
        |    CAST(CAST(('0x' || substr(md5(term), j * 4 + 1, 4))
        |      AS BIGINT) % 8192 AS INTEGER) AS bucket
        |  FROM toks CROSS JOIN js),
        |cnt AS (SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt
        |        FROM rb GROUP BY 1, 2),
        |probes AS (SELECT unnest(['the', 'a', 'of', 'and', 'to', 'in',
        |  'is', 'it', 'zzz-unseen']) AS term),
        |pe AS (
        |  SELECT term, j AS row,
        |    CAST(CAST(('0x' || substr(md5(term), j * 4 + 1, 4))
        |      AS BIGINT) % 8192 AS INTEGER) AS bucket
        |  FROM probes CROSS JOIN js)
        |SELECT term, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_count
        |FROM pe LEFT JOIN cnt USING (row, bucket) GROUP BY 1""".stripMargin,

    // range-join replay: plain BETWEEN join (DuckDB's IEJoin handles it
    // natively; the Spark side bins to keep an equi-join)
    // interval x interval overlap: the engine's binned ownership-bin
    // equi-join vs DuckDB's native inequality join — results must match
    "range_interval_overlap" ->
      """WITH a AS (
        |  SELECT (p_partkey % 22) + 1 AS chrom,
        |    (p_partkey % 9973) * 1000 AS a_lo,
        |    (p_partkey % 9973) * 1000 + 500 + (p_partkey % 5000) AS a_hi,
        |    'R' || p_partkey AS region_name
        |  FROM part),
        |b AS (
        |  SELECT (o_orderkey % 22) + 1 AS chrom,
        |    (o_custkey * 37 + o_orderkey) % 10000000 AS b_lo,
        |    (o_custkey * 37 + o_orderkey) % 10000000 + 200
        |      + (o_orderkey % 3000) AS b_hi,
        |    o_orderkey AS query_id
        |  FROM orders)
        |SELECT region_name, CAST(count(*) AS BIGINT) AS n_overlaps,
        |  CAST(min(b_lo) AS BIGINT) AS min_qlo,
        |  CAST(max(b_hi) AS BIGINT) AS max_qhi
        |FROM a JOIN b ON a.chrom = b.chrom
        |  AND a_lo <= b_hi AND b_lo <= a_hi
        |GROUP BY 1""".stripMargin,

    "range_points_regions" ->
      """WITH points AS (
        |  SELECT (o_orderkey % 22) + 1 AS chrom,
        |    (o_custkey * 37 + o_orderkey) % 10000000 AS pos,
        |    o_orderkey AS point_id
        |  FROM orders),
        |intervals AS (
        |  SELECT (p_partkey % 22) + 1 AS chrom,
        |    (p_partkey % 9973) * 1000 AS lo,
        |    (p_partkey % 9973) * 1000 + 500 + (p_partkey % 5000) AS hi,
        |    'R' || p_partkey AS region_name
        |  FROM part)
        |SELECT region_name, CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(min(pos) AS BIGINT) AS min_pos,
        |  CAST(max(pos) AS BIGINT) AS max_pos
        |FROM points JOIN intervals
        |  ON points.chrom = intervals.chrom
        |  AND points.pos BETWEEN intervals.lo AND intervals.hi
        |GROUP BY 1""".stripMargin,

    // as-of replay: union both sides, carry the last view forward per
    // user (views sort before clicks at equal ts; ties break on vid —
    // the same order the Spark struct compare yields)
    "asof_click_view" ->
      """WITH v AS (SELECT user_id, epoch_ns(ts) AS vts, event_id AS vid,
        |             value AS vval
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_ns(ts) AS cts, event_id AS cid
        |      FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id, vts AS uts, 0 AS side, vid, vts, vval,
        |    NULL::BIGINT AS cid
        |  FROM v
        |  UNION ALL
        |  SELECT user_id, cts, 1, NULL, NULL, NULL, cid FROM c),
        |w AS (
        |  SELECT user_id, uts, side, cid,
        |    last_value(vid IGNORE NULLS) OVER win AS view_event_id,
        |    last_value(vts IGNORE NULLS) OVER win AS view_ts,
        |    last_value(vval IGNORE NULLS) OVER win AS view_value
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY uts, side, vid
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, uts AS ts, cid AS event_id,
        |  view_ts, view_event_id, view_value
        |FROM w WHERE side = 1""".stripMargin,

    // forward as-of replay: the same union + carry-forward with ts DESC
    // (the engine negates timestamps and reuses the backward machinery);
    // equal-ts ties to the greatest vid, 3-day tolerance nulls far matches
    "asof_next_view" ->
      """WITH v AS (SELECT user_id, epoch_ns(ts) AS vts, event_id AS vid,
        |             value AS vval
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_ns(ts) AS cts, event_id AS cid
        |      FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id, vts AS uts, 0 AS side, vid, vts, vval,
        |    NULL::BIGINT AS cid
        |  FROM v
        |  UNION ALL
        |  SELECT user_id, cts, 1, NULL, NULL, NULL, cid FROM c),
        |w AS (
        |  SELECT user_id, uts, side, cid,
        |    last_value(vid IGNORE NULLS) OVER win AS nvid,
        |    last_value(vts IGNORE NULLS) OVER win AS nvts,
        |    last_value(vval IGNORE NULLS) OVER win AS nvval
        |  FROM u
        |  WINDOW win AS (PARTITION BY user_id ORDER BY uts DESC, side, vid
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, uts AS ts, cid AS event_id,
        |  CASE WHEN nvts - uts <= 259200000000000 THEN nvts END AS view_ts,
        |  CASE WHEN nvts - uts <= 259200000000000 THEN nvid
        |    END AS view_event_id,
        |  CASE WHEN nvts - uts <= 259200000000000 THEN nvval
        |    END AS view_value
        |FROM w WHERE side = 1""".stripMargin,

    // nearest as-of: BOTH carry-forward windows (asc = at-or-before,
    // desc = at-or-after) over one union, then pick the smaller gap,
    // ties to before — the engine's two-pass composition replayed
    "asof_nearest_view" ->
      """WITH v AS (SELECT user_id, epoch_ns(ts) AS vts, event_id AS vid,
        |             value AS vval
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, epoch_ns(ts) AS cts, event_id AS cid
        |      FROM events WHERE event_type = 'click'),
        |u AS (
        |  SELECT user_id, vts AS uts, 0 AS side, vid, vts, vval,
        |    NULL::BIGINT AS cid
        |  FROM v
        |  UNION ALL
        |  SELECT user_id, cts, 1, NULL, NULL, NULL, cid FROM c),
        |w AS (
        |  SELECT user_id, uts, side, cid,
        |    last_value(vid IGNORE NULLS) OVER wb AS bvid,
        |    last_value(vts IGNORE NULLS) OVER wb AS bvts,
        |    last_value(vval IGNORE NULLS) OVER wb AS bvval,
        |    last_value(vid IGNORE NULLS) OVER wf AS fvid,
        |    last_value(vts IGNORE NULLS) OVER wf AS fvts,
        |    last_value(vval IGNORE NULLS) OVER wf AS fvval
        |  FROM u
        |  WINDOW wb AS (PARTITION BY user_id ORDER BY uts, side, vid
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY user_id ORDER BY uts DESC, side, vid
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (
        |  SELECT user_id, uts, cid,
        |    (bvts IS NOT NULL AND (fvts IS NULL OR uts - bvts <= fvts - uts))
        |      AS pick_b,
        |    bvid, bvts, bvval, fvid, fvts, fvval
        |  FROM w WHERE side = 1)
        |SELECT user_id, uts AS ts, cid AS event_id,
        |  CASE WHEN pick_b THEN bvts ELSE fvts END AS view_ts,
        |  CASE WHEN pick_b THEN bvid ELSE fvid END AS view_event_id,
        |  CASE WHEN pick_b THEN bvval ELSE fvval END AS view_value,
        |  CASE WHEN bvts IS NULL AND fvts IS NULL THEN NULL
        |       WHEN pick_b THEN 'before' ELSE 'after' END AS view_from
        |FROM p""".stripMargin,

    // KMV bottom-k replay: k smallest distinct md5s by rank; estimate
    // from the kth hash's 52-bit prefix, float ops mirrored
    "sketch_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT lang, md5(text) AS h FROM documents),
        |r AS (SELECT lang, h,
        |        row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
        |      FROM h),
        |agg AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
        |    max(h) AS kth_hash
        |  FROM r WHERE rn <= 256 GROUP BY 1)
        |SELECT lang, n_kept, kth_hash,
        |  round(CASE WHEN n_kept < 256 THEN n_kept * 1.0
        |    ELSE 255 / (CAST(('0x' || substr(kth_hash, 1, 13)) AS BIGINT)
        |                / (1::BIGINT << 52)) END, 4) AS est_distinct
        |FROM agg""".stripMargin,

    // shf mirrors the Spark query's maxDocFreq=250 stop-shingle cap
    "dedup_ngram_jaccard" -> (ShingleCte +
      """, keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 250),
        |shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN keep USING (shingle)),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |""".stripMargin + JaccardTail.replace("FROM sh ", "FROM shf ")),

    // Two-stage composition: exact-dedup survivors feed the identical
    // minhash chain; copy counts join back from the fingerprint groups.
    "dedup_two_stage" ->
      """WITH g AS (
        |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f,
        |    min(doc_id) AS keep_id, count(*) AS n_copies
        |  FROM documents GROUP BY 1),
        |surv AS (
        |  SELECT d.doc_id, d.text FROM documents d JOIN g ON d.doc_id = g.keep_id),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM surv),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' ')))) AS shingle
        |  FROM toks WHERE len(t) >= 3),
        |mh AS (
        |  -- double-hashed MinHash (TextHash.minhashU64): one md5 per
        |  -- shingle, seed j derived as (lower64 + j*upper64) mod 2^64 in
        |  -- HUGEINT; ::VARCHAR of the HUGEINT == Long.toUnsignedString
        |  SELECT doc_id, j,
        |    min((md5_number_lower(shingle)::HUGEINT
        |         + j * md5_number_upper(shingle)::HUGEINT)
        |        % 18446744073709551616) AS minhash
        |  FROM sh, unnest(range(0, 8)) s(j) GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, j // 2 AS band,
        |    md5(string_agg(minhash::VARCHAR, '|' ORDER BY j)) AS band_key
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  JOIN cand ON a.doc_id = cand.da AND b.doc_id = cand.db
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
        |SELECT doc_a, doc_b,
        |  round(c::DOUBLE / (sa.n + sb.n - c)::DOUBLE, 6) AS jaccard,
        |  CAST(ga.n_copies AS BIGINT) AS copies_a,
        |  CAST(gb.n_copies AS BIGINT) AS copies_b
        |FROM common
        |JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |JOIN g ga ON doc_a = ga.keep_id JOIN g gb ON doc_b = gb.keep_id
        |WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.5""".stripMargin,

    // asymmetric batch-vs-history screen: exact fingerprint first, then
    // MinHash bands of the SURVIVING batch docs against history bands,
    // shingle-verified; matched_id = smallest matching history id (for
    // near: row_number over h_id mirrors Spark's struct-min)
    "dedup_incremental" ->
      """WITH hist AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        |bat AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
        |hfp AS (
        |  SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |    min(doc_id) AS h_exact
        |  FROM hist GROUP BY 1),
        |scr AS (
        |  SELECT b.doc_id, h.h_exact
        |  FROM bat b LEFT JOIN hfp h
        |    ON md5(lower(trim(regexp_replace(b.text, '\s+', ' ', 'g')))) = h.fp),
        |liveb AS (
        |  SELECT b.* FROM bat b JOIN scr ON b.doc_id = scr.doc_id
        |  WHERE scr.h_exact IS NULL),
        |tok_h AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0) AS t FROM hist),
        |sh_h AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' ')))) AS shingle
        |  FROM tok_h WHERE len(t) >= 3),
        |tok_b AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0) AS t FROM liveb),
        |sh_b AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' ')))) AS shingle
        |  FROM tok_b WHERE len(t) >= 3),
        |mh_h AS (
        |  SELECT doc_id, j,
        |    min((md5_number_lower(shingle)::HUGEINT
        |         + j * md5_number_upper(shingle)::HUGEINT)
        |        % 18446744073709551616) AS minhash
        |  FROM sh_h, unnest(range(0, 8)) s(j) GROUP BY 1, 2),
        |mh_b AS (
        |  SELECT doc_id, j,
        |    min((md5_number_lower(shingle)::HUGEINT
        |         + j * md5_number_upper(shingle)::HUGEINT)
        |        % 18446744073709551616) AS minhash
        |  FROM sh_b, unnest(range(0, 8)) s(j) GROUP BY 1, 2),
        |bands_h AS (
        |  SELECT doc_id, j // 2 AS band,
        |    md5(string_agg(minhash::VARCHAR, '|' ORDER BY j)) AS band_key
        |  FROM mh_h GROUP BY 1, 2),
        |bands_b AS (
        |  SELECT doc_id, j // 2 AS band,
        |    md5(string_agg(minhash::VARCHAR, '|' ORDER BY j)) AS band_key
        |  FROM mh_b GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT b.doc_id AS b_id, h.doc_id AS h_id
        |  FROM bands_b b JOIN bands_h h
        |    ON b.band = h.band AND b.band_key = h.band_key),
        |common AS (
        |  SELECT b.doc_id AS b_id, h.doc_id AS h_id, count(*) AS c
        |  FROM sh_b b JOIN sh_h h ON b.shingle = h.shingle
        |  JOIN cand ON b.doc_id = cand.b_id AND h.doc_id = cand.h_id
        |  GROUP BY 1, 2),
        |sizes_h AS (SELECT doc_id, count(*) AS n FROM sh_h GROUP BY 1),
        |sizes_b AS (SELECT doc_id, count(*) AS n FROM sh_b GROUP BY 1),
        |near0 AS (
        |  SELECT c.b_id, c.h_id,
        |    c.c::DOUBLE / (sb.n + sh2.n - c.c)::DOUBLE AS j
        |  FROM common c
        |  JOIN sizes_b sb ON c.b_id = sb.doc_id
        |  JOIN sizes_h sh2 ON c.h_id = sh2.doc_id
        |  WHERE c.c::DOUBLE / (sb.n + sh2.n - c.c)::DOUBLE >= 0.5),
        |near AS (
        |  SELECT b_id, h_id AS h_near, round(j, 6) AS j_near
        |  FROM near0
        |  QUALIFY row_number() OVER (PARTITION BY b_id ORDER BY h_id) = 1)
        |SELECT scr.doc_id,
        |  CASE WHEN scr.h_exact IS NOT NULL THEN 'exact'
        |       WHEN near.h_near IS NOT NULL THEN 'near'
        |       ELSE 'keep' END AS verdict,
        |  coalesce(scr.h_exact, near.h_near) AS matched_id,
        |  near.j_near AS jaccard
        |FROM scr LEFT JOIN near ON scr.doc_id = near.b_id""".stripMargin,

    "dedup_minhash_lsh" -> (ShingleCte +
      """, mh AS (
        |  -- double-hashed MinHash (TextHash.minhashU64): one md5 per
        |  -- shingle, seed j derived as (lower64 + j*upper64) mod 2^64 in
        |  -- HUGEINT; ::VARCHAR of the HUGEINT == Long.toUnsignedString
        |  SELECT doc_id, j,
        |    min((md5_number_lower(shingle)::HUGEINT
        |         + j * md5_number_upper(shingle)::HUGEINT)
        |        % 18446744073709551616) AS minhash
        |  FROM sh, unnest(range(0, 8)) s(j) GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, j // 2 AS band,
        |    md5(string_agg(minhash::VARCHAR, '|' ORDER BY j)) AS band_key
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  JOIN cand ON a.doc_id = cand.da AND b.doc_id = cand.db
        |  GROUP BY 1, 2),
        |""".stripMargin + JaccardTail),

    // Mirrors Dedup.clusters over the minhash pair graph: the verified
    // pairs become a recursive reachability closure; cluster label = min
    // reachable doc id (the transitive closure IS the label-propagation
    // fixpoint on this graph).
    "dedup_clusters" -> (ShingleCte.replaceFirst("^WITH ", "WITH RECURSIVE ") +
      """, mh AS (
        |  -- double-hashed MinHash (TextHash.minhashU64): one md5 per
        |  -- shingle, seed j derived as (lower64 + j*upper64) mod 2^64 in
        |  -- HUGEINT; ::VARCHAR of the HUGEINT == Long.toUnsignedString
        |  SELECT doc_id, j,
        |    min((md5_number_lower(shingle)::HUGEINT
        |         + j * md5_number_upper(shingle)::HUGEINT)
        |        % 18446744073709551616) AS minhash
        |  FROM sh, unnest(range(0, 8)) s(j) GROUP BY 1, 2),
        |bands AS (
        |  SELECT doc_id, j // 2 AS band,
        |    md5(string_agg(minhash::VARCHAR, '|' ORDER BY j)) AS band_key
        |  FROM mh GROUP BY 1, 2),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
        |  FROM bands x JOIN bands y
        |    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
        |common AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  JOIN cand ON a.doc_id = cand.da AND b.doc_id = cand.db
        |  GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |pairs AS (
        |  SELECT doc_a, doc_b
        |  FROM common JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id
        |  WHERE c::DOUBLE / (sa.n + sb.n - c)::DOUBLE >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION SELECT doc_b, doc_a FROM pairs
        |  UNION SELECT doc_a, doc_a FROM pairs
        |  UNION SELECT doc_b, doc_b FROM pairs),
        |reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        |SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1""".stripMargin),

    "dedup_simhash" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
        |    x -> len(x) > 0)) AS token FROM documents),
        |tw AS (SELECT doc_id, token, count(*) AS w FROM toks GROUP BY 1, 2),
        |th AS (SELECT doc_id, w, substring(md5(token), 1, 16) AS h16 FROM tw),
        |nibs0 AS (
        |  SELECT doc_id, w, i AS pos,
        |    strpos('0123456789abcdef', substring(h16, i, 1)) - 1 AS nib
        |  FROM th, unnest(range(1, 17)) p(i)),
        |bits AS (
        |  SELECT doc_id, w, (pos - 1) * 4 + b AS bitpos,
        |    CASE b WHEN 0 THEN (nib // 8) % 2 WHEN 1 THEN (nib // 4) % 2
        |           WHEN 2 THEN (nib // 2) % 2 ELSE nib % 2 END AS bit
        |  FROM nibs0, unnest(range(0, 4)) u(b)),
        |votes AS (
        |  SELECT doc_id, bitpos, sum(CASE WHEN bit = 1 THEN w ELSE -w END) AS vote
        |  FROM bits GROUP BY 1, 2),
        |nibs AS (
        |  SELECT doc_id, bitpos // 4 AS nibpos,
        |    sum((CASE WHEN vote > 0 THEN 1 ELSE 0 END) *
        |        (CASE bitpos % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) AS nibval
        |  FROM votes GROUP BY 1, 2)
        |SELECT doc_id,
        |  string_agg(substring('0123456789abcdef', (nibval + 1)::INT, 1), '' ORDER BY nibpos)
        |    AS simhash
        |FROM nibs GROUP BY 1""".stripMargin,

    // banded simhash pairing: 4x16-bit slices, slice equi-join, exact
    // nibble-wise hamming on candidates only (same hashes as dedup_simhash)
    "dedup_simhash_pairs" -> (SimhashCte +
      """, bands AS (
        |  SELECT doc_id, simhash, b, substring(simhash, 1 + 4 * b, 4) AS slice
        |  FROM hashes, unnest(range(0, 4)) u(b)),
        |cand AS (
        |  SELECT DISTINCT x.doc_id AS doc_a, x.simhash AS h_a,
        |         y.doc_id AS doc_b, y.simhash AS h_b
        |  FROM bands x JOIN bands y
        |    ON x.b = y.b AND x.slice = y.slice AND x.doc_id < y.doc_id),
        |scored AS (
        |  SELECT doc_a, doc_b,
        |    CAST(list_sum(list_transform(range(1, 17), i ->
        |      bit_count(xor(strpos('0123456789abcdef', substring(h_a, i, 1)) - 1,
        |                    strpos('0123456789abcdef', substring(h_b, i, 1)) - 1)))) AS BIGINT)
        |      AS hamming
        |  FROM cand)
        |SELECT doc_a, doc_b, hamming FROM scored WHERE hamming <= 3""".stripMargin),

    "text_lang_id" ->
      """WITH sc AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(t, x -> x IN ('der','die','das','und','ein','eine','zu','den'))) AS s_de,
        |    len(list_filter(t, x -> x IN ('the','a','of','and','to','in','is','it'))) AS s_en,
        |    len(list_filter(t, x -> x IN ('el','la','de','y','los','que','un','una'))) AS s_es,
        |    len(list_filter(t, x -> x IN ('le','la','de','et','les','des','un','une'))) AS s_fr,
        |    len(list_filter(t, x -> x IN ('的','是','在','了','和'))) AS s_zh
        |  FROM (SELECT doc_id, lang,
        |          list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |        FROM documents))
        |SELECT doc_id, lang,
        |  CASE WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
        |       WHEN s_en > s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
        |       WHEN s_es > s_de AND s_es > s_en AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |       WHEN s_fr > s_de AND s_fr > s_en AND s_fr > s_es AND s_fr >= s_zh THEN 'fr'
        |       ELSE 'zh' END AS predicted_lang
        |FROM sc""".stripMargin,

    // within-document 3-gram repetition: same tokenize/distinct as the
    // dedup shingle CTE, per doc
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_ngrams,
        |  CAST(CASE WHEN len(t) >= 3 THEN len(list_distinct(list_transform(
        |    range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))))
        |    ELSE 0 END AS BIGINT) AS n_distinct,
        |  round(CASE WHEN len(t) >= 3 THEN
        |    1.0 - len(list_distinct(list_transform(range(1, len(t) - 1),
        |      i -> array_to_string(t[i:i+2], ' '))))::DOUBLE / (len(t) - 2)
        |    ELSE 0.0 END, 6) AS repetition
        |FROM toks""".stripMargin,

    "text_contacts" ->
      """WITH d AS (
        |  SELECT c_custkey AS doc_id,
        |    CASE WHEN c_custkey % 3 = 0
        |      THEN c_name || ' plain row no contacts here'
        |      ELSE c_name || ' contact '
        |        || lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
        |        || '@example.com via https://ex.org/' || CAST(c_custkey AS VARCHAR)
        |        || ' phone ' || CAST(c_custkey * 137 + 10000000 AS VARCHAR)
        |    END AS text
        |  FROM customer)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_long_digit_runs,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<REDACTED>', 'g'),
        |    'https?://[^\s]+', '<REDACTED>', 'g'),
        |    '[0-9]{7,}', '<REDACTED>', 'g') AS redacted
        |FROM d""".stripMargin,

    // deterministic epoch shuffle: same md5 rank on both engines
    "sample_shuffle" ->
      """SELECT doc_id, lang,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('epoch0|' || CAST(doc_id AS VARCHAR))) AS BIGINT)
        |    AS shuffle_pos
        |FROM documents""".stripMargin,

    // stratified sampling mirrors the md5-prefix cutoffs exactly:
    // round(rate * 65536) as 4 hex digits, string-compared
    // md5-band split: cutoffs are the 16-bit grid points of the
    // cumulative fractions (0.8 -> 0xcccd, 0.9 -> 0xe666), the same
    // formula the engine compiles
    "sample_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |         THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |         THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CASE
        |  WHEN lang = 'de' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        |  WHEN lang = 'en' THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
        |  ELSE TRUE END""".stripMargin,
    // rates round to 6 dp BEFORE the 16-bit cutoff on both sides; a rate
    // clamped at 1.0 keeps everything (its %04x cutoff would be 5 chars
    // and string-compare wrongly against 'f...' prefixes)
    // epoch-mix repetition: floor(f) copies + one more where the salted
    // md5 band clears frac(f) (cutoffs: 0.5 -> '8000', 0.25 -> '4000'),
    // repeats exploded with copy index — replayed row-for-row
    "sample_epoch_mix" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CASE lang
        |      WHEN 'zh' THEN 2 + CASE WHEN substr(md5(
        |        CAST(doc_id AS VARCHAR) || '#epoch'), 1, 4) < '8000'
        |        THEN 1 ELSE 0 END
        |      WHEN 'fr' THEN 2
        |      WHEN 'de' THEN CASE WHEN substr(md5(
        |        CAST(doc_id AS VARCHAR) || '#epoch'), 1, 4) < '4000'
        |        THEN 1 ELSE 0 END
        |      WHEN 'es' THEN 0
        |      ELSE 1 END AS n
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CAST(unnest(range(1, n + 1)) AS BIGINT) AS epoch_copy
        |FROM c WHERE n >= 1""".stripMargin,

    // corpus-level boilerplate line removal: synthesized page, normalized
    // line -> distinct-doc frequency, >= 3 docs drops every occurrence,
    // survivors rejoin in original order
    "text_boilerplate" ->
      """WITH d AS (
        |  SELECT doc_id, concat_ws(chr(10), text,
        |    'Accept all cookies',
        |    CASE WHEN doc_id % 2 = 0 THEN 'home | products | contact' END,
        |    CASE WHEN doc_id % 5 = 0 THEN 'copyright 2024 example' END,
        |    'page footer ' || CAST(doc_id AS VARCHAR)) AS page
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos,
        |    unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(page, chr(10)) AS ls FROM d)),
        |n AS (SELECT doc_id, pos, line, lower(trim(line)) AS nrm FROM l),
        |hot AS (
        |  SELECT nrm FROM n WHERE len(nrm) > 0
        |  GROUP BY nrm HAVING count(DISTINCT doc_id) >= 3),
        |kept AS (SELECT * FROM n WHERE nrm NOT IN (SELECT nrm FROM hot)),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |    count(*) AS kept_lines
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(agg.clean_text, '') AS clean_text,
        |  CAST(coalesce(agg.kept_lines, 0) AS BIGINT) AS kept_lines,
        |  CAST(len(string_split(d.page, chr(10))) - coalesce(agg.kept_lines, 0)
        |    AS BIGINT) AS dropped_lines
        |FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin,

    // token-budget mixing: per-lang running est-BPE token totals in
    // md5-shuffle order; a doc is admitted iff its group's total BEFORE
    // it is under the lang's budget (straddler included)
    "sample_budget_mix" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST(ceil(n_chars::DOUBLE / 4.0) AS BIGINT) AS n_tokens,
        |    md5('mix0|' || CAST(doc_id AS VARCHAR)) AS sk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY sk
        |                             ROWS UNBOUNDED PRECEDING) - n_tokens
        |         AS BIGINT)
        |      AS tokens_before
        |  FROM s)
        |SELECT doc_id, lang, n_tokens, tokens_before
        |FROM c
        |WHERE tokens_before < CASE lang WHEN 'en' THEN 8000
        |                                WHEN 'zh' THEN 3000
        |                                ELSE 1000000000 END""".stripMargin,

    // composed upsampling recipe: the epoch-mix band + repeat explosion,
    // the shuffle rank keyed on doc_id#epoch_copy (repeat copies land in
    // DISTINCT positions), and the pack prefix sum over the SHUFFLED
    // order — replayed stage-for-stage
    "pipeline_recipe_e2e" ->
      """WITH c AS (
        |  SELECT doc_id, lang, n_chars,
        |    CASE lang
        |      WHEN 'zh' THEN 2 + CASE WHEN substr(md5(
        |        CAST(doc_id AS VARCHAR) || '#epoch'), 1, 4) < '8000'
        |        THEN 1 ELSE 0 END
        |      WHEN 'fr' THEN 2
        |      WHEN 'de' THEN CASE WHEN substr(md5(
        |        CAST(doc_id AS VARCHAR) || '#epoch'), 1, 4) < '4000'
        |        THEN 1 ELSE 0 END
        |      WHEN 'es' THEN 0
        |      ELSE 1 END AS n
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, n_chars,
        |    CAST(unnest(range(1, n + 1)) AS BIGINT) AS epoch_copy
        |  FROM c WHERE n >= 1),
        |sh AS (
        |  SELECT doc_id, epoch_copy,
        |    CAST(ceil(n_chars::DOUBLE / 4.0) AS BIGINT) AS n_tokens,
        |    CAST(row_number() OVER (ORDER BY md5('epoch1|' ||
        |      CAST(doc_id AS VARCHAR) || '#' || CAST(epoch_copy AS VARCHAR)))
        |      AS BIGINT) AS shuffle_pos
        |  FROM m)
        |SELECT doc_id, epoch_copy, shuffle_pos, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (ORDER BY shuffle_pos
        |                ROWS UNBOUNDED PRECEDING)
        |              - n_tokens)::DOUBLE / 2048.0) AS BIGINT) AS pack_id
        |FROM sh""".stripMargin,

    "sample_temperature" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n
        |           FROM documents GROUP BY 1),
        |g AS (SELECT sum(n) AS total, sum(pow(n, 0.5)) AS sumpow FROM c),
        |r AS (SELECT lang,
        |        round(least(1.0, 0.5 * g.total * pow(c.n, 0.5) / g.sumpow / c.n), 6)
        |          AS mix_rate
        |      FROM c, g)
        |SELECT d.doc_id, d.lang, r.mix_rate
        |FROM documents d JOIN r USING (lang)
        |WHERE r.mix_rate >= 1.0
        |   OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
        |      < printf('%04x', CAST(round(r.mix_rate * 65536) AS INT))""".stripMargin,
    // the composed corpus build: quality gate -> exact dedup ->
    // decontaminate (>= 0.5 leakage vs raw docs 0-24) -> en 50% sample ->
    // 2048-token packing; each CTE mirrors its standalone oracle
    "pipeline_training_e2e" ->
      """WITH x AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS t
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, text, n_chars FROM x
        |  WHERE round(greatest(
        |      least(len(t)::DOUBLE / 100.0, 1.0) * 0.5 +
        |      least(len(list_filter(t, s -> s IN ('the','a','of','and','to','in','is','it')))::DOUBLE
        |            / greatest(len(t)::DOUBLE, 1.0) * 4.0, 1.0) * 0.5 -
        |      least((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
        |            / greatest(n_chars::DOUBLE, 1.0) * 2.0, 0.5),
        |    0.0), 4) >= 0.3),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM q
        |  GROUP BY md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))),
        |d AS (SELECT q.* FROM q JOIN keep USING (doc_id)),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' ')))) AS shingle
        |  FROM x WHERE len(t) >= 3),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25),
        |contam AS (
        |  SELECT c.doc_id
        |  FROM (SELECT sh.* FROM sh JOIN d USING (doc_id) WHERE sh.doc_id >= 25) c
        |  LEFT JOIN bench b USING (shingle)
        |  GROUP BY c.doc_id
        |  HAVING sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |         / count(*)::DOUBLE >= 0.5),
        |clean AS (
        |  SELECT * FROM d
        |  WHERE doc_id >= 25 AND doc_id NOT IN (SELECT doc_id FROM contam)),
        |sampled AS (
        |  SELECT doc_id, lang, CAST(ceil(n_chars::DOUBLE / 4.0) AS BIGINT) AS n_tokens
        |  FROM clean
        |  WHERE CASE WHEN lang = 'en'
        |    THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        |    ELSE TRUE END)
        |SELECT doc_id, lang, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |              - n_tokens)::DOUBLE / 2048.0) AS BIGINT) AS pack_id
        |FROM sampled""".stripMargin,
    // same shingle semantics as the dedup oracles (3-gram, distinct,
    // ASCII-whitespace tokens); benchmark = doc_id < 25
    "decontaminate" -> (ShingleCte +
      """, corpus AS (SELECT * FROM sh WHERE doc_id >= 25),
        |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 25)
        |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
        |  CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  round(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
        |        / count(*)::DOUBLE, 6) AS contamination
        |FROM corpus c LEFT JOIN bench b USING (shingle)
        |GROUP BY 1""".stripMargin),
    // POSITIONAL shingles (duplicates kept — each occurrence is its own
    // span to cut); 1-based token index matches t[i:i+2]
    "decontaminate_spans" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |pos AS (
        |  SELECT doc_id, i AS span_start, array_to_string(t[i:i+2], ' ') AS shingle
        |  FROM tok, LATERAL unnest(range(1, len(t) - 1)) AS u(i)
        |  WHERE len(t) >= 3),
        |bench AS (SELECT DISTINCT shingle FROM pos WHERE doc_id < 25)
        |SELECT p.doc_id, CAST(p.span_start AS BIGINT) AS span_start, p.shingle
        |FROM pos p JOIN bench b USING (shingle)
        |WHERE p.doc_id >= 25 AND p.doc_id < 1000""".stripMargin,

    "text_chunks" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        |     c AS (SELECT doc_id, text,
        |             greatest(CAST(ceil((len - 64)::DOUBLE / 192.0) AS BIGINT), 1) AS n
        |           FROM d)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  substring(text, CAST(i*192 + 1 AS INT), 256) AS chunk
        |FROM c, LATERAL unnest(generate_series(0, n - 1)) AS t(i)""".stripMargin,
    // the pack id is a pure function of the running token total in doc_id
    // order, so the single-window SQL form is the exact oracle for the
    // distributed two-phase cumsum
    "pack_sequences" ->
      """WITH x AS (
        |  SELECT doc_id, CAST(ceil(n_chars::DOUBLE / 4.0) AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |              - n_tokens)::DOUBLE / 2048.0) AS BIGINT) AS pack_id
        |FROM x""".stripMargin,
    "text_quality" ->
      """WITH x AS (
        |  SELECT doc_id, text, n_chars,
        |    list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS t
        |  FROM documents)
        |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(ceil(n_chars::DOUBLE / 4.0) AS BIGINT) AS est_bpe_tokens,
        |  round(greatest(
        |    least(len(t)::DOUBLE / 100.0, 1.0) * 0.5 +
        |    least(len(list_filter(t, s -> s IN ('the','a','of','and','to','in','is','it')))::DOUBLE
        |          / greatest(len(t)::DOUBLE, 1.0) * 4.0, 1.0) * 0.5 -
        |    least((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')))::DOUBLE
        |          / greatest(n_chars::DOUBLE, 1.0) * 2.0, 0.5),
        |  0.0), 4) AS quality,
        |  substring(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 16) AS fp16
        |FROM x""".stripMargin,

    "ann_cosine_topk" -> (
      """WITH pairs AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
        |    round(""".stripMargin + EmbCosine +
      """, 6) AS cosine
        |  FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 20),
        |rk AS (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM pairs)
        |SELECT q_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin),

    // two-tier search replay: the ann_sq8 shortlist (top-50 by the
    // quantized asymmetric dot) re-ranked by EXACT cosine to top-10
    "ann_rerank" -> (
      """WITH sc AS (
        |  SELECT vec_id, embedding,
        |    round(list_max(list_transform(embedding,
        |      x -> abs(x::DOUBLE)))::DOUBLE / 127, 6) AS scale
        |  FROM embeddings),
        |enc AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale > 0 THEN list_transform(embedding,
        |      x -> least(127, greatest(-127, round(x::DOUBLE / scale)))::BIGINT)
        |    ELSE list_transform(embedding, x -> 0::BIGINT) END AS codes
        |  FROM sc),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    round(c.scale * list_sum(list_transform(
        |      range(1, len(c.codes) + 1),
        |      j -> c.codes[j]::DOUBLE * q.embedding[j]::DOUBLE)), 6) AS adot
        |  FROM embeddings q JOIN enc c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 20),
        |short AS (
        |  SELECT q_id, neighbor_id FROM (
        |    SELECT q_id, neighbor_id,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY adot DESC, neighbor_id) AS rn
        |    FROM pairs) t WHERE rn <= 50),
        |rr AS (
        |  SELECT s.q_id, s.neighbor_id,
        |    round(""".stripMargin + EmbCosine.replace("a.embedding", "qa.embedding")
        .replace("b.embedding", "nb.embedding") +
      """, 6) AS cosine
        |  FROM short s
        |  JOIN embeddings qa ON qa.vec_id = s.q_id
        |  JOIN embeddings nb ON nb.vec_id = s.neighbor_id),
        |rk AS (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM rr)
        |SELECT q_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin),

    // binary-quantization replay: hamming between packed sign bits ==
    // the count of positions whose sign bits differ (the packing is
    // representation, cross-checked bit-for-bit in SimilaritySpec);
    // shortlist of 50 by hamming ASC with neighbor-id ties, then the
    // exact-cosine re-rank to top-10
    "ann_binary" -> (
      """WITH pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(range(1, len(c.embedding) + 1),
        |      i -> CASE WHEN (q.embedding[i] > 0) <> (c.embedding[i] > 0)
        |           THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 20),
        |short AS (
        |  SELECT q_id, neighbor_id FROM (
        |    SELECT q_id, neighbor_id,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY hamming ASC, neighbor_id) AS rn
        |    FROM pairs) t WHERE rn <= 50),
        |rr AS (
        |  SELECT s.q_id, s.neighbor_id,
        |    round(""".stripMargin + EmbCosine.replace("a.embedding", "qa.embedding")
        .replace("b.embedding", "nb.embedding") +
      """, 6) AS cosine
        |  FROM short s
        |  JOIN embeddings qa ON qa.vec_id = s.q_id
        |  JOIN embeddings nb ON nb.vec_id = s.neighbor_id),
        |rk AS (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM rr)
        |SELECT q_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin),

    // HTML extraction replay: page synthesis + the exact regex chain
    // (script/style/comment blocks whole, structuring tags -> newline,
    // other tags -> space, entities with &amp; last, line normalize);
    // DuckDB regexes need the 'g' flag for Spark's replace-all default
    "text_html_extract" ->
      ("""WITH page AS (
        |  SELECT doc_id,
        |    '<!DOCTYPE html><html><head><style>body{color:red}</style>' ||
        |    '<script type="text/javascript">var x = 1 < 2 && 2 > 1;</script></head>' ||
        |    '<body><!-- crawler note --><h1>Doc ' || doc_id::VARCHAR || '</h1>' ||
        |    '<p>' || text || '</p>' ||
        |    CASE WHEN doc_id % 2 = 0
        |      THEN '<div>&quot;quoted&quot; &amp;amp; more</div>' ELSE '' END ||
        |    '<ul><li>nav&nbsp;one</li><li>nav two</li></ul></body></html>' AS html
        |  FROM documents),
        |ext AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(html, '\r\n?', chr(10), 'g'),
        |      '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table|/section|/article)\b[^>]*>',
        |      chr(10), 'g'),
        |      '(?s)<[^>]*>', ' ', 'g') AS t
        |  FROM page),
        |ent AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(t,
        |      '&nbsp;', ' '), '&#39;', ''''), '&quot;', '"'),
        |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS t
        |  FROM ext)
        |SELECT doc_id,
        |  array_to_string(list_filter(list_transform(
        |    string_split(regexp_replace(t, '[ \t]+', ' ', 'g'), chr(10)),
        |    l -> trim(l)), l -> len(l) > 0), chr(10)) AS clean_text
        |FROM ent""".stripMargin),

    // intra-doc line dedup replay: synthesized repeats, first-occurrence
    // keep on the lower+trim norm, blanks never dedup (1-based lambda
    // index; prior-slice contains check == the Spark filter HOF)
    "text_line_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, concat_ws(chr(10), text, 'Nav | Bar',
        |    'nav | bar ', text, 'footer ' || CAST(doc_id AS VARCHAR)) AS page
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, lines,
        |    list_transform(lines, l -> lower(trim(l))) AS norms
        |  FROM (SELECT doc_id, string_split(page, chr(10)) AS lines FROM d)),
        |k AS (
        |  SELECT doc_id, lines,
        |    list_filter(lines, (x, i) -> norms[i] = ''
        |      OR NOT list_contains(norms[1:i-1], norms[i])) AS kept
        |  FROM n)
        |SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,
        |  CAST(len(lines) AS BIGINT) AS n_lines,
        |  CAST(len(lines) - len(kept) AS BIGINT) AS n_removed
        |FROM k""".stripMargin,

    // web-prep E2E: page synthesis -> the text_html_extract chain ->
    // the text_boilerplate line-frequency strip -> the dedup_winnowing
    // pair replay over the CLEANED text, all under one hash
    "pipeline_web_e2e" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    '<html><head><style>nav{x:1}</style><script>t(1<2)</script></head><body>' ||
        |    '<div>Accept all cookies</div><div>home | products | contact</div>' ||
        |    '<p>' || text || '</p></body></html>' AS html
        |  FROM documents),
        |ex AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(html, '\r\n?', chr(10), 'g'),
        |      '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
        |      '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
        |      '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?i)<(br|/p|/div|/li|/h[1-6]|/tr|/ul|/ol|/table|/section|/article)\b[^>]*>',
        |      chr(10), 'g'),
        |      '(?s)<[^>]*>', ' ', 'g') AS t
        |  FROM p),
        |en AS (
        |  SELECT doc_id,
        |    replace(replace(replace(replace(replace(replace(t,
        |      '&nbsp;', ' '), '&#39;', ''''), '&quot;', '"'),
        |      '&lt;', '<'), '&gt;', '>'), '&amp;', '&') AS t
        |  FROM ex),
        |dx AS (
        |  SELECT doc_id,
        |    array_to_string(list_filter(list_transform(
        |      string_split(regexp_replace(t, '[ \t]+', ' ', 'g'), chr(10)),
        |      l -> trim(l)), l -> len(l) > 0), chr(10)) AS page
        |  FROM en),
        |l AS (
        |  SELECT doc_id, unnest(range(1, len(ls) + 1)) AS pos,
        |    unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(page, chr(10)) AS ls FROM dx)),
        |n AS (SELECT doc_id, pos, line, lower(trim(line)) AS nrm FROM l),
        |hot AS (
        |  SELECT nrm FROM n WHERE len(nrm) > 0
        |  GROUP BY nrm HAVING count(DISTINCT doc_id) >= 3),
        |kept AS (SELECT * FROM n WHERE nrm NOT IN (SELECT nrm FROM hot)),
        |clean AS (
        |  SELECT dx.doc_id, coalesce(agg.clean_text, '') AS text
        |  FROM dx LEFT JOIN (
        |    SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
        |    FROM kept GROUP BY doc_id) agg ON dx.doc_id = agg.doc_id),
        |tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM clean),
        |kg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks) - 5 + 2),
        |      i -> md5_number_lower(array_to_string(toks[i: i + 5 - 1], ' '))) AS hs
        |  FROM tok WHERE len(toks) >= 5),
        |wins AS (
        |  SELECT doc_id, hs,
        |    unnest(range(0, greatest(len(hs) - 4 + 1, 1))) AS j
        |  FROM kg),
        |pick AS (
        |  SELECT doc_id, hs, j, list_min(hs[j+1: j+4]) AS mh FROM wins),
        |fps AS (SELECT DISTINCT doc_id, mh AS fp FROM pick),
        |capped AS (
        |  SELECT fp FROM fps GROUP BY fp
        |  HAVING count(*) > 1 AND count(*) <= 10000)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |JOIN capped c ON c.fp = a.fp
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    // winnowing replay (Schleimer et al. 2003): ASCII-whitespace tokens,
    // md5_number_lower 5-gram hashes (the same digest-half convention as
    // the MinHash oracle), window w=4 minimum with the RIGHTMOST tie
    // (max position where the window min recurs), overlapping-window
    // re-selections collapsed by DISTINCT; fp renders as the UBIGINT's
    // decimal string == Long.toUnsignedString
    "text_winnowing" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |kg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks) - 5 + 2),
        |      i -> md5_number_lower(array_to_string(toks[i: i + 5 - 1], ' '))) AS hs
        |  FROM tok WHERE len(toks) >= 5),
        |wins AS (
        |  SELECT doc_id, hs,
        |    unnest(range(0, greatest(len(hs) - 4 + 1, 1))) AS j
        |  FROM kg),
        |pick AS (
        |  SELECT doc_id, hs, j, list_min(hs[j+1: j+4]) AS mh FROM wins)
        |SELECT DISTINCT doc_id,
        |  CAST(list_max(list_transform(range(1, least(4, len(hs) - j) + 1),
        |    i -> CASE WHEN hs[j+i] = mh THEN j+i ELSE NULL END)) AS BIGINT) AS pos,
        |  CAST(mh AS VARCHAR) AS fp
        |FROM pick""".stripMargin,

    // span-level winnowing matches: every shared fingerprint with its
    // selected positions in both docs, doc-frequency cap replayed
    "dedup_winnowing_spans" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |kg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks) - 5 + 2),
        |      i -> md5_number_lower(array_to_string(toks[i: i + 5 - 1], ' '))) AS hs
        |  FROM tok WHERE len(toks) >= 5),
        |wins AS (
        |  SELECT doc_id, hs,
        |    unnest(range(0, greatest(len(hs) - 4 + 1, 1))) AS j
        |  FROM kg),
        |pick AS (
        |  SELECT doc_id, hs, j, list_min(hs[j+1: j+4]) AS mh FROM wins),
        |sel AS (
        |  SELECT DISTINCT doc_id,
        |    list_max(list_transform(range(1, least(4, len(hs) - j) + 1),
        |      i -> CASE WHEN hs[j+i] = mh THEN j+i ELSE NULL END)) AS pos,
        |    mh AS fp
        |  FROM pick),
        |capped AS (
        |  SELECT fp FROM sel GROUP BY fp
        |  HAVING count(DISTINCT doc_id) > 1
        |     AND count(DISTINCT doc_id) <= 10000)
        |SELECT a.doc_id AS doc_a, CAST(a.pos AS BIGINT) AS pos_a,
        |  b.doc_id AS doc_b, CAST(b.pos AS BIGINT) AS pos_b,
        |  CAST(a.fp AS VARCHAR) AS fp
        |FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |JOIN capped c ON c.fp = a.fp""".stripMargin,

    // corpus snapshot diff: the exact-fingerprint identity over the two
    // synthesized snapshots; whitespace-only rewrites stay unchanged
    "corpus_diff" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        |  FROM documents WHERE doc_id % 7 <> 0),
        |n AS (
        |  SELECT doc_id,
        |    md5(lower(trim(regexp_replace(
        |      CASE WHEN doc_id % 3 = 0 THEN text || ' revised'
        |           WHEN doc_id % 3 = 1 THEN text || '  '
        |           ELSE text END, '\s+', ' ', 'g')))) AS fp
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp = n.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""".stripMargin,

    // incremental span evidence: batch (doc_id < 25) fingerprints joined
    // to history (>= 25) fingerprints, cap on HISTORY doc frequency
    "dedup_winnowing_incremental" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |kg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks) - 5 + 2),
        |      i -> md5_number_lower(array_to_string(toks[i: i + 5 - 1], ' '))) AS hs
        |  FROM tok WHERE len(toks) >= 5),
        |wins AS (
        |  SELECT doc_id, hs,
        |    unnest(range(0, greatest(len(hs) - 4 + 1, 1))) AS j
        |  FROM kg),
        |pick AS (
        |  SELECT doc_id, hs, j, list_min(hs[j+1: j+4]) AS mh FROM wins),
        |sel AS (
        |  SELECT DISTINCT doc_id,
        |    list_max(list_transform(range(1, least(4, len(hs) - j) + 1),
        |      i -> CASE WHEN hs[j+i] = mh THEN j+i ELSE NULL END)) AS pos,
        |    mh AS fp
        |  FROM pick),
        |hist AS (SELECT doc_id, pos, fp FROM sel WHERE doc_id >= 25),
        |capped AS (
        |  SELECT fp FROM hist GROUP BY fp
        |  HAVING count(DISTINCT doc_id) <= 10000)
        |SELECT b.doc_id AS batch_id, CAST(b.pos AS BIGINT) AS pos_b,
        |  h.doc_id AS hist_id, CAST(h.pos AS BIGINT) AS pos_h,
        |  CAST(b.fp AS VARCHAR) AS fp
        |FROM sel b JOIN hist h ON h.fp = b.fp
        |JOIN capped c ON c.fp = b.fp
        |WHERE b.doc_id < 25""".stripMargin,

    // shared-winnowing-fingerprint candidate pairs: distinct selected
    // fps per doc, docs sharing >= 2, hot-fp cap 10000 replayed
    "dedup_winnowing" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |kg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks) - 5 + 2),
        |      i -> md5_number_lower(array_to_string(toks[i: i + 5 - 1], ' '))) AS hs
        |  FROM tok WHERE len(toks) >= 5),
        |wins AS (
        |  SELECT doc_id, hs,
        |    unnest(range(0, greatest(len(hs) - 4 + 1, 1))) AS j
        |  FROM kg),
        |pick AS (
        |  SELECT doc_id, hs, j, list_min(hs[j+1: j+4]) AS mh FROM wins),
        |fps AS (SELECT DISTINCT doc_id, mh AS fp FROM pick),
        |capped AS (
        |  SELECT fp FROM fps GROUP BY fp
        |  HAVING count(*) > 1 AND count(*) <= 10000)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(count(*) AS BIGINT) AS n_shared
        |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |JOIN capped c ON c.fp = a.fp
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    // SQ8 replay: per-vector 6-dp scale, clamped half-away-from-zero int8
    // codes, asymmetric dot by sequential-order list_sum (the native
    // dot's ascending-index accumulation), rank ties on neighbor id
    "ann_sq8" ->
      """WITH sc AS (
        |  SELECT vec_id, embedding,
        |    round(list_max(list_transform(embedding,
        |      x -> abs(x::DOUBLE)))::DOUBLE / 127, 6) AS scale
        |  FROM embeddings),
        |enc AS (
        |  SELECT vec_id, scale,
        |    CASE WHEN scale > 0 THEN list_transform(embedding,
        |      x -> least(127, greatest(-127, round(x::DOUBLE / scale)))::BIGINT)
        |    ELSE list_transform(embedding, x -> 0::BIGINT) END AS codes
        |  FROM sc),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    round(c.scale * list_sum(list_transform(
        |      range(1, len(c.codes) + 1),
        |      j -> c.codes[j]::DOUBLE * q.embedding[j]::DOUBLE)), 6) AS adot
        |  FROM embeddings q JOIN enc c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 20),
        |rk AS (
        |  SELECT q_id, neighbor_id, adot,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adot DESC, neighbor_id) AS rn
        |  FROM pairs)
        |SELECT q_id, neighbor_id, adot, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin,

    // sequential-order list_sum matches the native dot's ascending-index
    // accumulation (same contract EmbCosine relies on); signs replay the
    // md5 Rademacher convention of hyperplaneSigns
    "embed_project" ->
      """WITH signs AS (
        |  SELECT j, i,
        |    CASE WHEN strpos('0123456789abcdef',
        |           substring(md5(j::VARCHAR || '_' || (i - 1)::VARCHAR), 1, 1)) - 1 < 8
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM unnest(range(0, 16)) p(j), unnest(range(1, 65)) d(i)),
        |sl AS (SELECT j, list(s ORDER BY i) AS sl FROM signs GROUP BY 1)
        |SELECT vec_id, CAST(j AS BIGINT) AS j,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> embedding[i]::DOUBLE * sl[i])) / sqrt(16), 6) AS comp
        |FROM embeddings CROSS JOIN sl""".stripMargin,

    // JL projection (the embed_project replay) feeding brute-force
    // cosine top-k in 16-dim projected space; 6-dp-rounded components
    // make every downstream float replay exactly
    "ann_projected" ->
      """WITH signs AS (
        |  SELECT j, i,
        |    CASE WHEN strpos('0123456789abcdef',
        |           substring(md5(j::VARCHAR || '_' || (i - 1)::VARCHAR), 1, 1)) - 1 < 8
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM unnest(range(0, 16)) p(j), unnest(range(1, 65)) d(i)),
        |sl AS (SELECT j, list(s ORDER BY i) AS sl FROM signs GROUP BY 1),
        |proj AS (
        |  SELECT vec_id, list(comp ORDER BY j) AS p FROM (
        |    SELECT vec_id, j,
        |      round(list_sum(list_transform(range(1, 65),
        |        i -> embedding[i]::DOUBLE * sl[i])) / sqrt(16), 6) AS comp
        |    FROM embeddings CROSS JOIN sl) GROUP BY 1),
        |pairs AS (
        |  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(range(1, 17),
        |        i -> a.p[i] * b.p[i])) /
        |      (sqrt(list_sum(list_transform(a.p, x -> x * x))) *
        |       sqrt(list_sum(list_transform(b.p, x -> x * x)))), 6) AS cosine
        |  FROM proj a JOIN proj b ON b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 20),
        |rk AS (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM pairs)
        |SELECT q_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin,

    "ann_lsh_buckets" ->
      """WITH signs AS (
        |  SELECT j, i,
        |    CASE WHEN strpos('0123456789abcdef',
        |           substring(md5(j::VARCHAR || '_' || (i - 1)::VARCHAR), 1, 1)) - 1 < 8
        |         THEN 1.0 ELSE -1.0 END AS s
        |  FROM unnest(range(0, 8)) p(j), unnest(range(1, 65)) d(i)),
        |dots AS (
        |  SELECT vec_id, j, sum(embedding[i]::DOUBLE * s) AS dp
        |  FROM embeddings, signs GROUP BY 1, 2),
        |buckets AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN dp > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM dots GROUP BY 1)
        |SELECT bucket, count(*) AS n_vecs FROM buckets GROUP BY 1""".stripMargin,

    // Mirrors Similarity.ivfTopK: 16 lowest-id seed centroids, argmax
    // assignment on the ROUNDED cosine with centroid-id tiebreak, 4 probed
    // lists per query, rank within probed candidates only.
    // cluster-balanced diversity sample: the ann_ivf assignment argmax
    // + 5 per-cluster winners of the salted md5 race (52-bit prefix as
    // BIGINT), ties on vec_id
    "sample_cluster_balanced" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings),
        |cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
        |  FROM (SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM v)
        |  WHERE rn <= 16),
        |assign AS (
        |  SELECT vec_id, cid AS list_id FROM (
        |    SELECT a.vec_id, c.cid,
        |      row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |        round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |          i -> a.embedding[i]::DOUBLE * c.cvec[i]::DOUBLE))
        |          / (a.nrm * c.cnrm), 6) DESC, c.cid) AS rn
        |    FROM v a CROSS JOIN cents c) WHERE rn = 1),
        |raced AS (
        |  SELECT vec_id, list_id,
        |    CAST(('0x' || substring(md5('cb0' || '|' || CAST(vec_id AS VARCHAR)), 1, 13))
        |      AS BIGINT) AS race
        |  FROM assign)
        |SELECT list_id, CAST(pick AS BIGINT) AS pick, vec_id, race FROM (
        |  SELECT *, row_number() OVER (PARTITION BY list_id
        |    ORDER BY race, vec_id) AS pick
        |  FROM raced) WHERE pick <= 5""".stripMargin,

    "ann_ivf" ->
      """WITH v AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings),
        |cents AS (
        |  SELECT vec_id AS cid, embedding AS cvec, nrm AS cnrm
        |  FROM (SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM v)
        |  WHERE rn <= 16),
        |vc AS (
        |  SELECT a.vec_id, a.embedding, a.nrm, c.cid,
        |    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> a.embedding[i]::DOUBLE * c.cvec[i]::DOUBLE)) / (a.nrm * c.cnrm), 6) AS ccos
        |  FROM v a CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, embedding, nrm, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, embedding AS qvec, nrm AS qnrm, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 20) WHERE rn <= 4),
        |pairs AS (
        |  SELECT p.q_id, a.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(range(1, len(p.qvec) + 1),
        |      i -> p.qvec[i]::DOUBLE * a.embedding[i]::DOUBLE)) / (p.qnrm * a.nrm), 6) AS cosine
        |  FROM probes p JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.q_id),
        |rk AS (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM pairs)
        |SELECT q_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin,

    "dedup_embedding" -> (
      """WITH p AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |    """.stripMargin + EmbCosine +
      """ AS c
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT a_id, b_id, round(c, 6) AS cosine FROM p WHERE c >= 0.4""".stripMargin),

    "ann_ivf_kmeans" -> KmeansIvfSql,
    "dedup_semantic" -> SemanticDedupSql,

    // PQ/ADC replay: codebooks = subvector slices of the 16 lowest-id
    // vectors, per-sub distances rounded to 6 dp before the argmin
    // encode AND before the lookup-sum (the addends sit on the 6-dp
    // grid, so the sum is summation-order-proof at 6 dp)
    "ann_pq_adc" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e
        |  FROM embeddings),
        |subs AS (
        |  SELECT vec_id, s, list_slice(e, s * 8 + 1, s * 8 + 8) AS sub
        |  FROM v CROSS JOIN (SELECT unnest(range(8)) AS s)),
        |cb AS (
        |  SELECT s, CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1
        |    AS BIGINT) AS code_id, sub AS c
        |  FROM subs WHERE vec_id IN (SELECT vec_id FROM v ORDER BY vec_id LIMIT 16)),
        |dist AS (
        |  SELECT a.vec_id, a.s, b.code_id,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (a.sub[i] - b.c[i]) * (a.sub[i] - b.c[i]))), 6) AS d
        |  FROM subs a JOIN cb b ON a.s = b.s),
        |codes AS (
        |  SELECT vec_id, s, code_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
        |      ORDER BY d, code_id) AS rn FROM dist)
        |  WHERE rn = 1),
        |score AS (
        |  SELECT qd.vec_id AS q_id, c.vec_id AS neighbor_id,
        |    round(sum(qd.d), 6) AS adc_dist
        |  FROM codes c JOIN dist qd ON qd.s = c.s AND qd.code_id = c.code_id
        |  WHERE qd.vec_id < 20 AND c.vec_id <> qd.vec_id
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT q_id, neighbor_id, adc_dist,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, neighbor_id) AS rn
        |  FROM score)
        |SELECT q_id, neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin,

    // IVF + PQ: 16 seeded coarse lists prune (nprobe 4), the ann_pq_adc
    // codebook/encode/dist CTEs score the survivors
    "ann_ivfpq" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings),
        |cents AS (
        |  SELECT CAST(rn - 1 AS BIGINT) AS cid, e AS cvec, nrm AS cnrm FROM (
        |    SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM v)
        |  WHERE rn <= 16),
        |vc AS (
        |  SELECT a.vec_id, c.cid,
        |    round(list_sum(list_transform(range(1, len(a.e) + 1),
        |      j -> a.e[j] * c.cvec[j])) / (a.nrm * c.cnrm), 6) AS ccos
        |  FROM v a CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 20) WHERE rn <= 4),
        |subs AS (
        |  SELECT vec_id, s, list_slice(e, s * 8 + 1, s * 8 + 8) AS sub
        |  FROM v CROSS JOIN (SELECT unnest(range(8)) AS s)),
        |cb AS (
        |  SELECT s, CAST(row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1
        |    AS BIGINT) AS code_id, sub AS c
        |  FROM subs WHERE vec_id IN (SELECT vec_id FROM v ORDER BY vec_id LIMIT 16)),
        |dist AS (
        |  SELECT a.vec_id, a.s, b.code_id,
        |    round(list_sum(list_transform(range(1, 9),
        |      i -> (a.sub[i] - b.c[i]) * (a.sub[i] - b.c[i]))), 6) AS d
        |  FROM subs a JOIN cb b ON a.s = b.s),
        |codes AS (
        |  SELECT vec_id, s, code_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, s
        |      ORDER BY d, code_id) AS rn FROM dist)
        |  WHERE rn = 1),
        |score AS (
        |  SELECT p.q_id, a.vec_id AS neighbor_id, round(sum(qd.d), 6) AS adc_dist
        |  FROM probes p
        |  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.q_id
        |  JOIN codes c ON c.vec_id = a.vec_id
        |  JOIN dist qd ON qd.vec_id = p.q_id AND qd.s = c.s AND qd.code_id = c.code_id
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT q_id, neighbor_id, adc_dist,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, neighbor_id) AS rn
        |  FROM score)
        |SELECT q_id, neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin,

    // IVF + binary: the ann_ivfsq assign/probe machinery with the
    // ann_binary scorer — hamming == positional sign-mismatch count
    // (the packed representation is spec-verified), rank ASC with
    // neighbor-id ties
    "ann_ivfbq" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings),
        |cents AS (
        |  SELECT CAST(rn - 1 AS BIGINT) AS cid, e AS cvec, nrm AS cnrm FROM (
        |    SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM v)
        |  WHERE rn <= 16),
        |vc AS (
        |  SELECT a.vec_id, c.cid,
        |    round(list_sum(list_transform(range(1, len(a.e) + 1),
        |      j -> a.e[j] * c.cvec[j])) / (a.nrm * c.cnrm), 6) AS ccos
        |  FROM v a CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 20) WHERE rn <= 4),
        |score AS (
        |  SELECT p.q_id, a.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(range(1, len(c.e) + 1),
        |      j -> CASE WHEN (q.e[j] > 0) <> (c.e[j] > 0)
        |           THEN 1 ELSE 0 END)) AS BIGINT) AS hamming
        |  FROM probes p
        |  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.q_id
        |  JOIN v c ON c.vec_id = a.vec_id
        |  JOIN v q ON q.vec_id = p.q_id),
        |rk AS (
        |  SELECT q_id, neighbor_id, hamming,
        |    row_number() OVER (PARTITION BY q_id ORDER BY hamming ASC, neighbor_id) AS rn
        |  FROM score)
        |SELECT q_id, neighbor_id, hamming, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin,

    // IVF + SQ8: the ann_ivfpq assign/probe machinery with the ann_sq8
    // quantizer — per-vector 6-dp scale, clamped codes, asymmetric dot by
    // sequential-order list_sum, rank DESC with neighbor-id ties
    "ann_ivfsq" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e,
        |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
        |  FROM embeddings),
        |cents AS (
        |  SELECT CAST(rn - 1 AS BIGINT) AS cid, e AS cvec, nrm AS cnrm FROM (
        |    SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM v)
        |  WHERE rn <= 16),
        |vc AS (
        |  SELECT a.vec_id, c.cid,
        |    round(list_sum(list_transform(range(1, len(a.e) + 1),
        |      j -> a.e[j] * c.cvec[j])) / (a.nrm * c.cnrm), 6) AS ccos
        |  FROM v a CROSS JOIN cents c),
        |assign AS (
        |  SELECT vec_id, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS q_id, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 20) WHERE rn <= 4),
        |sc AS (
        |  SELECT vec_id,
        |    round(list_max(list_transform(e, x -> abs(x)))::DOUBLE / 127, 6) AS scale
        |  FROM v),
        |enc AS (
        |  SELECT v.vec_id, sc.scale,
        |    CASE WHEN sc.scale > 0 THEN list_transform(v.e,
        |      x -> least(127, greatest(-127, round(x / sc.scale)))::DOUBLE)
        |    ELSE list_transform(v.e, x -> 0::DOUBLE) END AS codes
        |  FROM v JOIN sc ON v.vec_id = sc.vec_id),
        |score AS (
        |  SELECT p.q_id, a.vec_id AS neighbor_id,
        |    round(c.scale * list_sum(list_transform(
        |      range(1, len(c.codes) + 1),
        |      j -> c.codes[j] * q.e[j])), 6) AS adot
        |  FROM probes p
        |  JOIN assign a ON a.list_id = p.list_id AND a.vec_id <> p.q_id
        |  JOIN enc c ON c.vec_id = a.vec_id
        |  JOIN v q ON q.vec_id = p.q_id),
        |rk AS (
        |  SELECT q_id, neighbor_id, adot,
        |    row_number() OVER (PARTITION BY q_id ORDER BY adot DESC, neighbor_id) AS rn
        |  FROM score)
        |SELECT q_id, neighbor_id, adot, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin,

    // the synthetic payloads make the expected pair set a pure function
    // of the group key (see TrainingData.multimodalImageDups): brightness
    // variants of one md5-keyed pattern aHash identically (hamming 0),
    // distinct patterns never land within the hamming-3 pairing radius
    "multimodal_image_dups" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200)
        |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM ids a JOIN ids b
        |  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id""".stripMargin,

    // the video twin: the Spark side REALLY walks the RIFF/AVI container
    // and JPEG-decodes every frame; the synthetic corpus makes the pair
    // set and each side's decoded frame count pure id arithmetic (group =
    // id // 4 shares byte-identical frames; variant id % 4 carries 1..4
    // frames), so the oracle gates the whole decode path arithmetically
    "multimodal_video_dups" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120)
        |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
        |  CAST(0 AS BIGINT) AS hamming,
        |  CAST(a.doc_id % 4 + 1 AS BIGINT) AS frames_a,
        |  CAST(b.doc_id % 4 + 1 AS BIGINT) AS frames_b
        |FROM ids a JOIN ids b
        |  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id""".stripMargin,

    // the audio twin: the Spark side REALLY decodes PCM via javax.sound
    // and fingerprints the RMS envelope; the synthetic WAVs make the
    // peak-normalized fingerprint exactly gain-invariant (square-wave RMS
    // is IEEE-exact), so amplitude variants of one md5-keyed envelope
    // pair at hamming 0 and the pair set is pure id arithmetic
    "multimodal_audio_dups" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200)
        |SELECT a.doc_id AS media_a, b.doc_id AS media_b,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM ids a JOIN ids b
        |  ON a.doc_id // 4 = b.doc_id // 4 AND a.doc_id < b.doc_id""".stripMargin,
  )

  /** Replays `Similarity.kmeansCentroids` + `ivfTopKWith` exactly: the 16
    * lowest-id vectors seed the quantizer, then THREE Lloyd iterations —
    * assignment by cosine rounded to 6 dp (smallest centroid id on ties),
    * update = per-dimension mean ROUNDED TO 6 DP (empty lists keep their
    * previous centroid) — the 6-dp rounding after every iteration is what
    * makes the trained centroids engine-portable and this hash compare
    * possible. The tail is the ann_ivf probe/search shape over the
    * trained centroids (nprobe 4, top 10). */
  private lazy val KmeansIvfSql: String =
    KmeansTrainedPrefix +
      """,
        |probes AS (
        |  SELECT vec_id AS q_id, embedding AS qvec, nrm AS qnrm, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc WHERE vec_id < 20) WHERE rn <= 4),
        |pairs AS (
        |  SELECT p.q_id, a.vec_id AS neighbor_id,
        |    round(list_sum(list_transform(range(1, len(p.qvec) + 1),
        |      j -> p.qvec[j]::DOUBLE * a.embedding[j]::DOUBLE)) / (p.qnrm * a.nrm), 6) AS cosine
        |  FROM probes p JOIN fin a ON a.list_id = p.list_id AND a.vec_id <> p.q_id),
        |rk AS (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rn
        |  FROM pairs)
        |SELECT q_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rank
        |FROM rk WHERE rn <= 10""".stripMargin

  /** SemDeDup over the same trained quantizer: same-list pairs with
    * ROUNDED cosine >= 0.3 mark the larger vec_id a duplicate; keep =
    * never the larger side of such a pair (lowest id survives). */
  private lazy val SemanticDedupSql: String =
    KmeansTrainedPrefix +
      """,
        |dups AS (
        |  SELECT DISTINCT b.vec_id AS b_id
        |  FROM fin a JOIN fin b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
        |  WHERE round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      j -> a.embedding[j]::DOUBLE * b.embedding[j]::DOUBLE)) / (a.nrm * b.nrm), 6) >= 0.3)
        |SELECT f.vec_id, f.list_id, d.b_id IS NULL AS keep
        |FROM fin f LEFT JOIN dups d ON f.vec_id = d.b_id""".stripMargin

  /** The shared trained-quantizer WITH-prefix (no trailing comma): seeded
    * centroids, three rounded Lloyd iterations, the final cosine table
    * `vc` and the per-vector assignment `fin` (vec_id, embedding, nrm,
    * list_id). */
  private lazy val KmeansTrainedPrefix: String = {
    def assign(i: Int) =
      s"""assign$i AS (
         |  SELECT vec_id, embedding, nrm, cid AS list_id FROM (
         |    SELECT v.vec_id, v.embedding, v.nrm, c.cid,
         |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |        round(list_sum(list_transform(range(1, len(v.embedding) + 1),
         |          j -> v.embedding[j]::DOUBLE * c.cvec[j])) / (v.nrm * c.cnrm), 6) DESC,
         |        c.cid) AS rn
         |    FROM v CROSS JOIN cents$i c) WHERE rn = 1),
         |u$i AS (
         |  SELECT list_id, pos, round(avg(val), 6) AS m FROM (
         |    SELECT list_id, unnest(embedding)::DOUBLE AS val,
         |           unnest(range(1, len(embedding) + 1)) AS pos
         |    FROM assign$i)
         |  GROUP BY 1, 2),
         |cents${i + 1} AS (
         |  SELECT p.cid, coalesce(n.nvec, p.cvec) AS cvec,
         |    sqrt(list_sum(list_transform(coalesce(n.nvec, p.cvec),
         |      x -> x * x))) AS cnrm
         |  FROM cents$i p LEFT JOIN (
         |    SELECT list_id AS cid, list(m ORDER BY pos) AS nvec
         |    FROM u$i GROUP BY 1) n USING (cid))""".stripMargin
    """WITH v AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |  FROM embeddings),
      |cents0 AS (
      |  SELECT CAST(rn - 1 AS BIGINT) AS cid,
      |    list_transform(embedding, x -> x::DOUBLE) AS cvec, nrm AS cnrm
      |  FROM (SELECT *, row_number() OVER (ORDER BY vec_id) AS rn FROM v)
      |  WHERE rn <= 16),
      |""".stripMargin +
      (0 until 3).map(assign).mkString("", ",\n", ",\n") +
      """vc AS (
        |  SELECT a.vec_id, a.embedding, a.nrm, c.cid,
        |    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      j -> a.embedding[j]::DOUBLE * c.cvec[j])) / (a.nrm * c.cnrm), 6) AS ccos
        |  FROM v a CROSS JOIN cents3 c),
        |fin AS (
        |  SELECT vec_id, embedding, nrm, cid AS list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
        |    FROM vc) WHERE rn = 1)""".stripMargin
  }

  /** The CM/Bloom merge-gate twins reuse the whole-corpus replays
    * VERBATIM: counter merge is addition and bit merge is OR, both
    * lossless, so the merged sketch must equal the one-shot sketch
    * bit-for-bit — same argument as sketch_hll_merged /
    * sketch_quantile_merged (those carry their own copies). */
  val mergeGates: Map[String, String] = Map(
    "sketch_cm_merged" -> trainingData("sketch_cm_tokens"),
    "sketch_bloom_merged" -> trainingData("sketch_bloom_contains"),
    // the ledger-fed screen persists and re-reads the history
    // fingerprint/band rows — pure functions of the text — so its
    // verdicts must equal the recompute form bit-for-bit
    "dedup_incremental_ledger" -> trainingData("dedup_incremental"))

  val statsAndTime: Map[String, String] = Map(
    "a7_zscore" ->
      """WITH logs AS (
        |  SELECT l_partkey, l_orderkey, l_linenumber,
        |    l_extendedprice AS raw_intensity,
        |    ln(l_extendedprice) / ln(2.0) AS log_intensity
        |  FROM lineitem),
        |calcs AS (
        |  SELECT l_partkey, median(log_intensity) AS med,
        |    stddev_samp(log_intensity) AS sd
        |  FROM logs GROUP BY 1)
        |SELECT l_partkey, l_orderkey, l_linenumber,
        |  round(raw_intensity, 2) AS raw_intensity,
        |  round(log_intensity, 6) AS log_intensity,
        |  round(CASE WHEN sd IS NULL OR sd = 0 THEN 0
        |        ELSE least(greatest((log_intensity - med) / sd, -2.5), 2.5) END, 4) AS zscore
        |FROM logs JOIN calcs USING (l_partkey)""".stripMargin,

    "a10_summary_stats" ->
      """WITH rk AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, count(*) AS n_values,
        |  round(avg(value), 4) AS mean,
        |  round(stddev_samp(value), 4) AS stddev,
        |  round(min(value), 2) AS min,
        |  round(max(value), 2) AS max,
        |  round(median(value), 2) AS median,
        |  round(median(CASE WHEN rn <= (n + 1) // 2 THEN value END), 2) AS lower_hinge,
        |  round(median(CASE WHEN rn >= n - (n + 1) // 2 + 1 THEN value END), 2) AS upper_hinge,
        |  round(median(CASE WHEN rn >= n - (n + 1) // 2 + 1 THEN value END)
        |      - median(CASE WHEN rn <= (n + 1) // 2 THEN value END), 2) AS iqr
        |FROM rk GROUP BY 1""".stripMargin,

    "a2_group_guard" ->
      "SELECT source, count(*) AS n_docs FROM documents GROUP BY 1",

    "a12_existence_guards" ->
      """SELECT count(*) AS violations FROM (
        |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1 HAVING count(DISTINCT p_brand) > 1)""".stripMargin,

    "j10_regex_join" ->
      """SELECT pattern, count(*) AS n_matches
        |FROM (SELECT '\' || r_name || '\' || n_name || '\' || c_name || '\' AS path
        |      FROM region JOIN nation ON r_regionkey = n_regionkey
        |      JOIN customer ON n_nationkey = c_nationkey) paths,
        |     (SELECT '^\\' || r_name || '\\.*' AS pattern FROM region) patterns
        |WHERE regexp_matches(path, pattern)
        |GROUP BY 1""".stripMargin,

    "fn_timepoint" ->
      """WITH base AS (SELECT user_id, min(epoch_ns(ts)) AS b FROM events GROUP BY 1),
        |d AS (SELECT event_id, (epoch_ns(ts) - b) // 1000000000 AS secs
        |      FROM events JOIN base USING (user_id)),
        |c AS (SELECT event_id, secs,
        |        secs // 86400 AS dd, (secs % 86400) // 3600 AS hh,
        |        (secs % 3600) // 60 AS mm, secs % 60 AS ss
        |      FROM d)
        |SELECT event_id, trim(
        |  CASE WHEN secs = 0 THEN 'Baseline' ELSE '' END ||
        |  CASE WHEN dd <> 0 THEN dd::VARCHAR || ' day' ||
        |    CASE WHEN dd > 1 THEN 's ' ELSE ' ' END ELSE '' END ||
        |  CASE WHEN hh <> 0 THEN hh::VARCHAR || ' hour' ||
        |    CASE WHEN hh > 1 THEN 's ' ELSE ' ' END ELSE '' END ||
        |  CASE WHEN mm <> 0 THEN mm::VARCHAR || ' minute' ||
        |    CASE WHEN mm > 1 THEN 's ' ELSE ' ' END ELSE '' END ||
        |  CASE WHEN ss <> 0 THEN ss::VARCHAR || ' second' ||
        |    CASE WHEN ss > 1 THEN 's ' ELSE ' ' END ELSE '' END) AS timepoint
        |FROM c""".stripMargin,

    "fn_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  count(json_extract_string(props, '$.k')) AS k_count
        |FROM events GROUP BY 1""".stripMargin,

    "w3_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL
        |         OR epoch_ns(ts) - epoch_ns(prev_ts) > 1800000000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM g)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM s GROUP BY 1""".stripMargin,
  )

  val relational: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "j1_multi_join" ->
      """SELECT n_name, o_orderpriority,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,

    "j3_full_outer" ->
      """SELECT coalesce(u1, u2) AS user_id,
        |  coalesce(purchase_total, 0.0) AS purchase_total,
        |  CAST(coalesce(error_count, 0) AS BIGINT) AS error_count
        |FROM
        |  (SELECT user_id AS u1, round(sum(value), 2) AS purchase_total
        |   FROM events WHERE event_type = 'purchase' GROUP BY 1) buys
        |FULL OUTER JOIN
        |  (SELECT user_id AS u2, count(*) AS error_count
        |   FROM events WHERE event_type = 'error' GROUP BY 1) errs
        |ON u1 = u2""".stripMargin,

    "j4_left_join" ->
      """SELECT c_custkey, c_mktsegment,
        |  coalesce(order_total, 0.0) AS order_total,
        |  CAST(coalesce(order_count, 0) AS BIGINT) AS order_count
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, round(sum(o_totalprice), 2) AS order_total,
        |             count(*) AS order_count
        |           FROM orders GROUP BY 1) o
        |ON c_custkey = o_custkey""".stripMargin,

    "j5_anti_join" ->
      """SELECT c_mktsegment, count(*) AS customers_without_orders
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,

    "j6_semi_join" ->
      """SELECT c_nationkey, count(*) AS customers_with_urgent_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |GROUP BY 1""".stripMargin,

    "j9_update_join" ->
      """SELECT c_custkey, round(coalesce(c_acctbal, 0.0), 2) AS acctbal, last_order_date
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, max(o_orderdate) AS last_order_date
        |           FROM orders GROUP BY 1) o
        |ON c_custkey = o_custkey""".stripMargin,

    "w1_first_value" ->
      """SELECT c_nationkey, first_customer_in_nation, count(*) AS n_customers
        |FROM (SELECT c_nationkey,
        |        first_value(c_name) OVER (PARTITION BY c_nationkey ORDER BY c_name)
        |          AS first_customer_in_nation
        |      FROM customer) x
        |GROUP BY 1, 2""".stripMargin,

    "w2_keep_one" ->
      """SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS first_price
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_orderkey
        |          ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey) AS rn
        |      FROM lineitem) x
        |WHERE rn = 1""".stripMargin,

    "a3_pivot" ->
      """SELECT user_id,
        |  round(max(CASE WHEN event_type = 'purchase' THEN value END), 2) AS max_purchase,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_total,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_count,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
        |FROM events GROUP BY 1""".stripMargin,

    "a4_dup_detect" ->
      """SELECT l_partkey, l_suppkey, count(*) AS dup_count
        |FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1""".stripMargin,

    "a5_null_consistency" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent_rows,
        |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS non_urgent_rows,
        |  round(max(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS max_urgent_price
        |FROM orders GROUP BY 1""".stripMargin,

    "u1_set_ops" ->
      """SELECT direction, count(*) AS n_customers FROM (
        |  SELECT o_custkey, '1994_only' AS direction FROM (
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994
        |    EXCEPT
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
        |  UNION ALL
        |  SELECT o_custkey, '1995_only' AS direction FROM (
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |    EXCEPT
        |    SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994)
        |) GROUP BY 1""".stripMargin,

    "p2_melt" ->
      """SELECT metric, round(sum(value), 2) AS metric_sum,
        |  round(avg(value), 4) AS metric_avg, count(*) AS n_values
        |FROM (
        |  SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'tax', l_tax FROM lineitem)
        |GROUP BY 1""".stripMargin,
  )

  /** Deep-omics round 5: the chromosomal-region registry
    * (I2B2_LOAD_CHROM_REGION) and the aCGH fact build
    * (I2B2_PROCESS_ACGH_DATA), mirroring OmicsQueries' synthesized
    * inputs. */
  val omicsDeep: Map[String, String] = Map(
    "chrom_region" ->
      """WITH staged AS (
        |  SELECT 'GPL_A' AS gpl_id, 'R' || p_partkey AS region_name,
        |    CAST((p_partkey % 22) + 1 AS VARCHAR) AS chromosome,
        |    CAST((p_partkey % 1000000) * 1000 AS INT) AS start_bp,
        |    CAST((p_partkey % 1000000) * 1000 + 999 AS INT) AS end_bp,
        |    p_size AS num_probes, p_brand AS cytoband,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL
        |         ELSE 'G' || (p_partkey % 50) END AS gene_symbol,
        |    CASE WHEN p_partkey % 3 = 0 THEN NULL
        |         ELSE CAST(p_partkey % 200 AS BIGINT) END AS gene_id,
        |    CASE WHEN p_partkey % 4 = 0 THEN 'HOMO SAPIENS'
        |         ELSE 'Homo Sapiens' END AS organism
        |  FROM part),
        |kept AS (
        |  SELECT CAST(n_nationkey + 1000 AS BIGINT) AS region_id,
        |    'GPL_B' AS gpl_id, n_name AS region_name,
        |    CAST(NULL AS VARCHAR) AS chromosome, CAST(NULL AS INT) AS start_bp,
        |    CAST(NULL AS INT) AS end_bp, CAST(NULL AS INT) AS num_probes,
        |    CAST(NULL AS VARCHAR) AS cytoband, CAST(NULL AS VARCHAR) AS gene_symbol,
        |    CAST(NULL AS BIGINT) AS gene_id, 'Homo Sapiens' AS organism
        |  FROM nation WHERE n_nationkey % 2 <> 0),
        |gonly AS (
        |  SELECT 'G' || (s_suppkey % 50) AS bio_marker_name,
        |    CASE WHEN s_suppkey % 2 = 0 THEN 'HOMO SAPIENS' ELSE 'Mus musculus' END AS organism,
        |    CAST(s_suppkey % 200 AS VARCHAR) AS primary_external_id
        |  FROM supplier WHERE s_suppkey % 10 <> 0),
        |idbysym AS (
        |  SELECT bio_marker_name AS sym, upper(organism) AS org,
        |    min(CAST(primary_external_id AS BIGINT)) AS gid
        |  FROM gonly GROUP BY 1, 2),
        |symbyid AS (
        |  SELECT CAST(primary_external_id AS BIGINT) AS gid, upper(organism) AS org,
        |    min(bio_marker_name) AS sym
        |  FROM gonly GROUP BY 1, 2),
        |withids AS (
        |  SELECT s.gpl_id, s.region_name, s.chromosome, s.start_bp, s.end_bp,
        |    s.num_probes, s.cytoband, s.gene_symbol,
        |    coalesce(s.gene_id, i.gid) AS gene_id, s.organism
        |  FROM staged s LEFT JOIN idbysym i
        |    ON s.gene_id IS NULL AND s.gene_symbol IS NOT NULL
        |   AND s.gene_symbol = i.sym AND upper(s.organism) = i.org),
        |backfilled AS (
        |  SELECT w.gpl_id, w.region_name, w.chromosome, w.start_bp, w.end_bp,
        |    w.num_probes, w.cytoband,
        |    coalesce(w.gene_symbol, s2.sym) AS gene_symbol, w.gene_id, w.organism
        |  FROM withids w LEFT JOIN symbyid s2
        |    ON w.gene_symbol IS NULL AND w.gene_id IS NOT NULL
        |   AND w.gene_id = s2.gid AND upper(w.organism) = s2.org)
        |SELECT region_id, gpl_id, region_name, chromosome, start_bp, end_bp,
        |  num_probes, cytoband, gene_symbol, gene_id, organism
        |FROM kept
        |UNION ALL
        |SELECT (SELECT coalesce(max(region_id), 0) FROM kept)
        |    + row_number() OVER (ORDER BY gpl_id, region_name) AS region_id,
        |  gpl_id, region_name, chromosome, start_bp, end_bp,
        |  num_probes, cytoband, gene_symbol, gene_id, organism
        |FROM backfilled""".stripMargin,

    "acgh_facts" ->
      """WITH m AS (
        |  SELECT s_name AS sample_cd, CAST(s_suppkey + 5000 AS BIGINT) AS patient_id,
        |    row_number() OVER (ORDER BY s_name) AS assay_id
        |  FROM supplier),
        |f AS (
        |  SELECT DISTINCT CAST(l.l_partkey AS BIGINT) AS region_id,
        |    m.assay_id, m.patient_id,
        |    l.l_quantity AS chip, l.l_discount AS segmented,
        |    l.l_linenumber % 2 AS flag, l.l_tax AS probloss,
        |    l.l_quantity + 1 AS probnorm, l.l_discount AS probgain,
        |    l.l_tax AS probamp
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN m ON s.s_name = m.sample_cd)
        |SELECT CAST(1 AS BIGINT) AS partition_id, region_id,
        |  CAST(assay_id AS BIGINT) AS assay_id, patient_id,
        |  'TPCH' AS trial_name,
        |  round(chip, 4) + 0.0 AS chip,
        |  round(segmented, 4) + 0.0 AS segmented, flag,
        |  round(probloss, 4) + 0.0 AS probloss,
        |  round(probnorm, 4) + 0.0 AS probnorm,
        |  round(probgain, 4) + 0.0 AS probgain,
        |  round(probamp, 4) + 0.0 AS probamp
        |FROM f""".stripMargin,

    "annot_proteomics" ->
      """SELECT gpl_id, peptide, uniprot_id, uniprot_name, organism FROM (
        |  SELECT CASE WHEN n_nationkey % 2 = 0 THEN 'GPLP' ELSE 'GPLQ' END AS gpl_id,
        |    'OLD' || n_nationkey AS peptide, CAST(NULL AS VARCHAR) AS uniprot_id,
        |    CAST(NULL AS VARCHAR) AS uniprot_name, 'Homo sapiens' AS organism
        |  FROM nation) e WHERE gpl_id <> 'GPLP'
        |UNION ALL
        |SELECT DISTINCT 'GPLP' AS gpl_id,
        |  trim('  PEP' || p_partkey || '  ') AS peptide,
        |  CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE 'U' || (p_partkey % 100) END AS uniprot_id,
        |  CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE 'U' || (p_partkey % 100) END AS uniprot_name,
        |  coalesce(CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE 'Homo Sapiens' END,
        |    'Homo sapiens') AS organism
        |FROM part""".stripMargin,

    "annot_rna" ->
      """WITH staged AS (
        |  SELECT DISTINCT 'T' || (p_partkey % 1800) AS transcript_id, 'GPLR' AS gpl_id,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE 'G' || (p_partkey % 50) END AS gene_symbol,
        |    CAST(NULL AS BIGINT) AS gene_id, 'Homo sapiens' AS organism
        |  FROM part),
        |existing AS (
        |  SELECT 'T' || n_nationkey AS transcript_id, 'GPLOLD' AS gpl_id,
        |    CASE WHEN n_nationkey % 2 = 1 THEN 'G' || n_nationkey END AS gene_symbol,
        |    CASE WHEN n_nationkey % 3 <> 0 THEN CAST(n_nationkey + 900 AS BIGINT) END AS gene_id,
        |    'Homo sapiens' AS organism
        |  FROM nation),
        |allrows AS (
        |  SELECT * FROM existing
        |  UNION ALL
        |  SELECT * FROM staged s
        |  WHERE s.transcript_id NOT IN (SELECT DISTINCT transcript_id FROM existing)),
        |idbysym AS (
        |  SELECT 'G' || (s_suppkey % 50) AS sym,
        |    min(CAST(s_suppkey % 200 AS BIGINT)) AS gid
        |  FROM supplier GROUP BY 1)
        |SELECT a.transcript_id, a.gpl_id, a.gene_symbol,
        |  coalesce(a.gene_id, i.gid) AS gene_id, a.organism
        |FROM allrows a LEFT JOIN idbysym i
        |  ON a.gene_id IS NULL AND a.gene_symbol = i.sym""".stripMargin,

    "annot_mirna" ->
      """WITH staged AS (
        |  SELECT 'MIR' || p_partkey AS id_ref,
        |    CASE WHEN p_partkey % 6 = 0 THEN NULL
        |         ELSE 'HSA-MIR-' || (p_partkey % 300) END AS mirna_id,
        |    CASE WHEN p_partkey % 4 = 0 THEN NULL ELSE 'Homo Sapiens' END AS organism,
        |    'GPLM' AS gpl_id
        |  FROM part),
        |probesets AS (
        |  SELECT CAST(n_nationkey + 500 AS BIGINT) AS probeset_id,
        |    'MIR' || (n_nationkey * 10) AS probeset, 'Old organism' AS organism,
        |    CASE WHEN n_nationkey % 2 = 0 THEN 'GPLM' ELSE 'GPLZ' END AS platform
        |  FROM nation),
        |sorg AS (SELECT id_ref, min(organism) AS new_organism FROM staged GROUP BY 1),
        |skeys AS (SELECT DISTINCT id_ref, gpl_id FROM staged),
        |refreshed AS (
        |  SELECT p.probeset_id, p.probeset, p.platform,
        |    CASE WHEN k.id_ref IS NOT NULL THEN o.new_organism
        |         ELSE p.organism END AS organism
        |  FROM probesets p
        |  LEFT JOIN skeys k ON p.probeset = k.id_ref AND p.platform = k.gpl_id
        |  LEFT JOIN sorg o ON p.probeset = o.id_ref),
        |fresh AS (
        |  SELECT DISTINCT id_ref AS probeset,
        |    coalesce(organism, 'Homo sapiens') AS organism, gpl_id AS platform
        |  FROM staged s
        |  WHERE NOT EXISTS (SELECT 1 FROM refreshed r
        |    WHERE r.probeset = s.id_ref AND r.platform = s.gpl_id)),
        |registry AS (
        |  SELECT probeset_id, probeset, platform, organism FROM refreshed
        |  UNION ALL
        |  SELECT (SELECT coalesce(max(probeset_id), 0) FROM refreshed)
        |      + row_number() OVER (ORDER BY platform, probeset, organism),
        |    probeset, platform, organism
        |  FROM fresh)
        |SELECT DISTINCT s.id_ref, CAST(NULL AS VARCHAR) AS probe_id,
        |  CAST(NULL AS VARCHAR) AS mirna_symbol, lower(s.mirna_id) AS mirna_id,
        |  r.probeset_id, coalesce(s.organism, 'Homo sapiens') AS organism, s.gpl_id
        |FROM staged s JOIN registry r
        |  ON s.id_ref = r.probeset AND s.gpl_id = r.platform
        | AND coalesce(s.organism, 'Homo sapiens') = coalesce(r.organism, 'Homo sapiens')""".stripMargin,

    "annot_rbm" ->
      """WITH staged AS (
        |  SELECT 'GPLB' AS gpl_id, 'ANT' || (p_partkey % 400) AS antigen_name,
        |    CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE 'U' || (p_partkey % 100) END AS uniprotid,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE 'G' || (p_partkey % 50) END AS gene_symbol,
        |    CASE WHEN p_partkey % 3 = 0 THEN NULL
        |         ELSE CAST(p_partkey % 200 AS VARCHAR) END AS gene_id
        |  FROM part),
        |antigens AS (
        |  SELECT CAST(n_nationkey + 300 AS BIGINT) AS antigen_id,
        |    'ANT' || n_nationkey AS antigen_name,
        |    CASE WHEN n_nationkey % 2 = 0 THEN 'GPLB' ELSE 'GPLQ' END AS platform
        |  FROM nation),
        |fresh AS (
        |  SELECT DISTINCT antigen_name, gpl_id AS platform FROM staged s
        |  WHERE NOT EXISTS (SELECT 1 FROM antigens a
        |    WHERE a.antigen_name = s.antigen_name AND a.platform = s.gpl_id)),
        |registry AS (
        |  SELECT antigen_id, antigen_name, platform FROM antigens
        |  UNION ALL
        |  SELECT (SELECT coalesce(max(antigen_id), 0) FROM antigens)
        |      + row_number() OVER (ORDER BY platform, antigen_name),
        |    antigen_name, platform
        |  FROM fresh),
        |rows0 AS (
        |  SELECT DISTINCT s.gpl_id, r.antigen_id AS id, s.antigen_name,
        |    s.uniprotid AS uniprot_id, s.gene_symbol,
        |    CAST(s.gene_id AS BIGINT) AS gene_id
        |  FROM staged s JOIN registry r
        |    ON s.antigen_name = r.antigen_name AND s.gpl_id = r.platform),
        |rbmm AS (
        |  SELECT 'G' || (s_suppkey % 50) AS bio_marker_name,
        |    CAST(s_suppkey % 200 AS VARCHAR) AS primary_external_id
        |  FROM supplier WHERE s_suppkey % 3 = 0),
        |idbysym AS (
        |  SELECT bio_marker_name AS sym,
        |    CAST(min(primary_external_id) AS BIGINT) AS gid
        |  FROM rbmm GROUP BY 1),
        |symbyid AS (
        |  SELECT primary_external_id AS gid2, min(bio_marker_name) AS sym2
        |  FROM rbmm GROUP BY 1)
        |SELECT r.gpl_id, r.id, r.antigen_name, r.uniprot_id,
        |  CASE WHEN coalesce(r.gene_symbol, '') = '' THEN s2.sym2
        |       ELSE r.gene_symbol END AS gene_symbol,
        |  coalesce(r.gene_id, i.gid) AS gene_id
        |FROM rows0 r
        |LEFT JOIN idbysym i ON r.gene_id IS NULL
        |  AND coalesce(r.gene_symbol, '') <> '' AND r.gene_symbol = i.sym
        |LEFT JOIN symbyid s2 ON coalesce(r.gene_symbol, '') = ''
        |  AND r.gene_id IS NOT NULL AND CAST(r.gene_id AS VARCHAR) = s2.gid2""".stripMargin,

    "annot_metabolomics" ->
      """WITH staged AS (
        |  SELECT 'GPLX' AS gpl_id, 'BIO' || p_partkey AS biochemical_name,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL
        |         ELSE 'HMDB' || (p_partkey % 250) END AS hmdb_id
        |  FROM part WHERE p_partkey % 8 = 0),
        |markers AS (
        |  SELECT 'BIO' || (n_nationkey * 16) AS bio_marker_name,
        |    'EXT' || n_nationkey AS primary_external_id
        |  FROM nation)
        |SELECT row_number() OVER (ORDER BY biochemical_name, hmdb_id) AS id,
        |  gpl_id, biochemical_name, biomarker_id, hmdb_id
        |FROM (
        |  SELECT s.gpl_id, trim(s.biochemical_name) AS biochemical_name,
        |    m.primary_external_id AS biomarker_id, s.hmdb_id
        |  FROM staged s LEFT JOIN markers m
        |    ON s.biochemical_name = m.bio_marker_name) j""".stripMargin,

    "annot_metab_sub_pathways" ->
      """WITH staged AS (
        |  SELECT 'GPLX' AS gpl_id,
        |    'Sup ' || (p_partkey % 5) AS super_pathway,
        |    'Sub' || (p_partkey % 7) || ';Sub' || (p_partkey % 11) AS sub_pathway
        |  FROM part WHERE p_partkey % 8 = 0),
        |sup AS (
        |  SELECT row_number() OVER (ORDER BY super_pathway) AS id, gpl_id,
        |    super_pathway AS super_pathway_name
        |  FROM (SELECT DISTINCT gpl_id, super_pathway FROM staged) d),
        |splitrows AS (
        |  SELECT gpl_id, super_pathway,
        |    unnest(string_split(sub_pathway, ';')) AS sub_pathway
        |  FROM staged)
        |SELECT row_number() OVER (ORDER BY sub_pathway_name, super_pathway_id) AS id,
        |  gpl_id, sub_pathway_name, super_pathway_id
        |FROM (
        |  SELECT sr.gpl_id, trim(sr.sub_pathway) AS sub_pathway_name,
        |    sup.id AS super_pathway_id
        |  FROM splitrows sr
        |  JOIN sup ON trim(sr.super_pathway) = trim(sup.super_pathway_name)) j""".stripMargin,
  )

  /** Oracles DERIVED from other entries by string surgery, so the shared
    * replay (here: the LSH-pairs -> recursive-components chain) can
    * never drift between its consumers. */
  val derived: Map[String, String] = {
    val clusters = trainingData("dedup_clusters")
    val tail = "SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1"
    require(clusters.endsWith(tail), "dedup_clusters oracle tail moved")
    // leakage-safe split: component labels joined back to documents,
    // the 80/10/10 md5-band split keyed on coalesce(cluster, doc_id) —
    // cutoffs 0.8 -> 'cccd', 0.9 -> 'e666', same grid as sample_split
    Map(
    // keep/drop verdict application: component labels joined back to
    // the corpus — keep = unpaired or the cluster min; dropped docs
    // name their survivor
    "dedup_apply" ->
      (clusters.dropRight(tail.length) +
        """, comp AS (
          |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1)
          |SELECT d.doc_id,
          |  (c.cluster_id IS NULL OR c.cluster_id = d.doc_id) AS keep,
          |  CASE WHEN c.cluster_id IS NOT NULL AND c.cluster_id <> d.doc_id
          |    THEN c.cluster_id END AS kept_id
          |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin),
    "sample_split_safe" ->
      (clusters.dropRight(tail.length) +
        """, comp AS (
          |  SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY 1)
          |SELECT d.doc_id, d.lang, c.cluster_id,
          |  CASE WHEN substr(md5(CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 4)
          |         < 'cccd' THEN 'train'
          |       WHEN substr(md5(CAST(coalesce(c.cluster_id, d.doc_id) AS VARCHAR)), 1, 4)
          |         < 'e666' THEN 'val'
          |       ELSE 'test' END AS split
          |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id""".stripMargin))
  }

  /** BPE fit replayed as an unrolled 12-stage CTE chain (one pair-count
    * argmax + one greedy merge sweep per stage — Sennrich et al. 2016,
    * mirrored from [[graft.operators.Bpe]]): words as chr(31)-joined
    * char lists, pair counts from adjacent indices weighted by word
    * frequency, best pair by (count DESC, first, second) under DuckDB's
    * binary collation (== the Spark side's UTF-8 tie-break), merge as
    * one leftmost non-overlapping `replace`. MATERIALIZED keeps the
    * chain linear — each w_i feeds both p_{i+1} and w_{i+1}. */
  private val BpeK = 12

  /** [[graft.operators.Bpe.pretokens]] in RE2 spelling: pad each
    * Han/Hiragana/Katakana code point with spaces (RE2 `\p{Han}` ==
    * Java `\p{IsHan}`, both Unicode Script=Han), then extract
    * letter(+mark) runs, digit runs and other-non-space runs. The
    * whitespace class is the explicit ASCII set — Java's and RE2's `\s`
    * disagree on \x0B, so neither shorthand is used. Cross-engine
    * equality is spec-pinned (BpePretokenSpec) and gate-checked
    * (text_bpe_pretokens). */
  private def pretokSql(c: String): String =
    s"""regexp_extract_all(regexp_replace(translate($c, chr(31), ''), """ +
      """'([\p{Han}\p{Hiragana}\p{Katakana}])', ' \1 ', 'g'), """ +
      """'[\p{L}\p{M}]+|\p{N}+|[^ \t\n\x0B\f\r\p{L}\p{M}\p{N}]+')"""

  /** [[graft.operators.Bpe.byteEncode]] replayed in SQL: the UTF-8
    * bytes via `hex(encode(...))`, each hex pair mapped through the
    * GPT-2 byte -> unicode bijection as a generated 256-branch CASE.
    * The byte map is READ FROM the Spark implementation
    * ([[graft.operators.Bpe.ByteToChar]]) — one source of truth, so the
    * twins can never drift. `c` must be a simple column/lambda-var
    * reference (it is spliced twice). */
  private def byteEncSql(c: String): String = {
    val cases = (0 until 256).map(b =>
      s"WHEN '${"%02X".format(b)}' THEN chr(${graft.operators.Bpe.ByteToChar(b)})")
      .mkString(" ")
    s"array_to_string(list_transform(" +
      s"range(CAST(octet_length(encode($c)) AS BIGINT)), " +
      s"i -> CASE substr(hex(encode($c)), CAST(2*i+1 AS INT), 2) " +
      s"$cases END), '')"
  }

  /** [[graft.operators.Bpe.byteDecode]] replayed in SQL: each code
    * point back to its hex pair (inverse CASE), reassembled through
    * `unhex` + `decode`. */
  private def byteDecSql(c: String): String = {
    val cases = (0 until 256).map(b =>
      s"WHEN ${graft.operators.Bpe.ByteToChar(b)} THEN '${"%02X".format(b)}'")
      .mkString(" ")
    s"decode(unhex(array_to_string(list_transform(string_split($c, ''), " +
      s"ch -> CASE unicode(ch) $cases END), '')))"
  }

  /** The fit chain over source CTE/view `src` (must expose `text`);
    * `byteBase = true` fits on byte-encoded pretokens ([[byteEncSql]]) —
    * the GPT-2-class base where every symbol is a byte image. */
  private def bpeChainFor(src: String, byteBase: Boolean = false): String = {
    val parts = Seq.newBuilder[String]
    // double-separator boundaries (see Bpe.Sep): a symbol boundary is
    // chr(31)||chr(31); a merge pattern is single-chr(31)-bounded, so it
    // can never match across a boundary (symbol-exact) yet adjacent
    // occurrences still merge back-to-back (leftmost-greedy). chr(31)
    // itself is stripped by the pretokenizer, mirroring the Spark side.
    // Each p_i unions a SENTINEL row (chr(31), chr(31), cnt 0) under the
    // argmax: when the corpus exhausts mergeable pairs before stage K
    // the sentinel wins (every real pair has cnt >= 1), its 6-separator
    // replace pattern cannot occur (boundary runs are at most 4 and
    // symbols are separator-free), so the stage passes w through
    // unchanged instead of collapsing the whole chain to empty — and
    // the merge-rows gate filters sentinels with cnt > 0, matching the
    // Spark side's early stop.
    val wordsFrom =
      if (!byteBase) s"(SELECT unnest(${pretokSql("text")}) AS w FROM $src)"
      else s"(SELECT ${byteEncSql("w")} AS w FROM " +
        s"(SELECT unnest(${pretokSql("text")}) AS w FROM $src))"
    parts += s"""w0 AS MATERIALIZED (
      |  SELECT chr(31) || chr(31) ||
      |      array_to_string(string_split(w, ''), chr(31) || chr(31)) ||
      |      chr(31) || chr(31) AS ws,
      |    CAST(count(*) AS BIGINT) AS freq
      |  FROM $wordsFrom
      |  GROUP BY 1)""".stripMargin
    for (i <- 1 to BpeK) {
      val p = i - 1
      parts += s"""p$i AS MATERIALIZED (
        |  SELECT first, second, cnt FROM (
        |    SELECT syms[i] AS first, syms[i+1] AS second,
        |      CAST(sum(freq) AS BIGINT) AS cnt
        |    FROM (SELECT syms, freq, unnest(range(1, len(syms))) AS i
        |          FROM (SELECT list_filter(string_split(ws, chr(31) || chr(31)),
        |                  x -> x <> '') AS syms, freq FROM w$p))
        |    GROUP BY 1, 2
        |    UNION ALL
        |    SELECT chr(31), chr(31), CAST(0 AS BIGINT))
        |  ORDER BY cnt DESC, first, second LIMIT 1),
        |w$i AS MATERIALIZED (
        |  SELECT replace(ws,
        |      chr(31) || first || chr(31) || chr(31) || second || chr(31),
        |      chr(31) || first || second || chr(31)) AS ws,
        |    freq FROM w$p, p$i)""".stripMargin
    }
    parts.result().mkString(",\n")
  }

  /** The mixed-script probe corpus CTE — IDENTICAL rows to
    * [[graft.queries.TrainingData.mixedDocs]], built from the same
    * literals (one source of truth). */
  private val mixedCte: String = {
    val phrases = graft.queries.TrainingData.CjkPhrases
      .map(p => "'" + p.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    val tail = graft.queries.TrainingData.PunctTail.replace("'", "''")
    s"""mixed AS MATERIALIZED (
       |  SELECT doc_id, doc_id % 4 AS variant,
       |    substr(text, 1, 30) || ' ' ||
       |      ($phrases)[CAST(doc_id % 4 AS INT) + 1] || ' $tail' AS text
       |  FROM documents)""".stripMargin
  }

  /** The byte-base probe corpus CTE — IDENTICAL rows to
    * [[graft.queries.TrainingData.BytePhrases]]-derived `byteDocs`,
    * built from the same literals. */
  private val byteCte: String = {
    val phrases = graft.queries.TrainingData.BytePhrases
      .map(p => "'" + p.replace("'", "''") + "'")
      .mkString("[", ", ", "]")
    s"""bytedocs AS MATERIALIZED (
       |  SELECT doc_id, variant, text,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
       |  FROM (
       |    SELECT doc_id, doc_id % 4 AS variant,
       |      substr(text, 1, 24) || ' ' ||
       |        ($phrases)[CAST(doc_id % 4 AS INT) + 1] AS text
       |    FROM documents))""".stripMargin
  }

  val bpe: Map[String, String] = {
    val mergeRows = (1 to BpeK).map { i =>
      s"SELECT $i AS rank, first, second, first || second AS merged, " +
        s"cnt AS pair_count FROM p$i WHERE cnt > 0"
    }.mkString("\nUNION ALL ")
    val mrgCols = (1 to BpeK).map { i =>
      s"chr(31) || p$i.first || chr(31) || chr(31) || p$i.second || chr(31) AS a$i, " +
        s"chr(31) || p$i.first || p$i.second || chr(31) AS b$i"
    }.mkString(", ")
    val mrgFrom = (1 to BpeK).map("p" + _).mkString(", ")
    val nested = (1 to BpeK).foldLeft(
      "chr(31) || chr(31) || array_to_string(string_split(w, ''), " +
        "chr(31) || chr(31)) || chr(31) || chr(31)") { (acc, i) =>
      s"replace($acc, a$i, b$i)"
    }
    // per-doc token counts for source `src`, chain already in scope;
    // `extra` columns of the source ride through (they must be plain
    // column names present on src)
    def tokensBodyFor(src: String, extra: Seq[String],
                      byteBase: Boolean = false): String = {
      val ec = extra.map(c => s"$c, ").mkString
      val toksExpr =
        if (!byteBase) pretokSql("text")
        else s"list_transform(${pretokSql("text")}, w -> ${byteEncSql("w")})"
      s"""mrg AS MATERIALIZED (SELECT $mrgCols FROM $mrgFrom),
         |tok AS (SELECT doc_id, $ec$toksExpr AS toks FROM $src)
         |SELECT doc_id, ${ec}CAST(len(toks) AS BIGINT) AS n_words,
         |  CAST(coalesce(list_sum(list_transform(toks,
         |    w -> (len($nested) - len(replace($nested, chr(31), ''))) // 2
         |         - 1)), 0) AS BIGINT)
         |    AS n_bpe_tokens
         |FROM tok, mrg""".stripMargin
    }
    val tokensSql =
      s"""WITH ${bpeChainFor("documents")},
         |${tokensBodyFor("documents", Nil)}""".stripMargin
    Map(
      "text_bpe_merges" -> s"WITH ${bpeChainFor("documents")}\n$mergeRows",
      "text_bpe_tokens" -> tokensSql,
      // the native-segmenter gate answers to the SAME replay — chain and
      // native forms are one semantics, one oracle
      "text_bpe_tokens_native" -> tokensSql,
      // byte-base cross-check: `documents` is pure ASCII, where the
      // GPT-2 byte bijection is the identity on every pretoken — the
      // independent byte-base fit + apply must reproduce the CHAR-base
      // oracle bit for bit, so it answers to the same replay
      "text_bpe_tokens_bytes" -> tokensSql,
      // the byte base over the garbage corpus: codec replayed through
      // hex(encode(...)) byte maps, fit chain over encoded words, apply
      // fold, and the round-trip re-decode (n_roundtrip must be n_docs)
      "text_bpe_bytes" ->
        s"""WITH $byteCte,
           |${bpeChainFor("bytedocs", byteBase = true)},
           |cnts AS (
           |WITH ${tokensBodyFor(
                "(SELECT doc_id, variant, n_bytes, text FROM bytedocs)",
                Seq("variant", "n_bytes"), byteBase = true)}),
           |rt0 AS (SELECT doc_id, text, ${byteEncSql("text")} AS enc
           |        FROM bytedocs),
           |rt AS (SELECT doc_id,
           |         CASE WHEN ${byteDecSql("enc")} = text THEN 1 ELSE 0 END
           |           AS ok
           |       FROM rt0)
           |SELECT c.variant, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(c.n_bytes) AS BIGINT) AS bytes,
           |  CAST(sum(c.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
           |  CASE WHEN sum(c.n_bpe_tokens) > 0
           |    THEN round(sum(c.n_bytes)::DOUBLE / sum(c.n_bpe_tokens), 4)
           |  END AS bytes_per_token,
           |  CAST(sum(r.ok) AS BIGINT) AS n_roundtrip
           |FROM cnts c JOIN rt r ON c.doc_id = r.doc_id
           |GROUP BY 1""".stripMargin,
      // chars-per-token by language: compression rate of the fitted
      // tokenizer; n_chars is the table's engine-neutral length column.
      // (The Spark side is single-scan via pass-through columns; the
      // join here is on the primary key, so the VALUES are identical.)
      "text_bpe_compression" ->
        s"""WITH cnts AS (SELECT doc_id, n_bpe_tokens FROM ($tokensSql))
           |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(d.n_chars) AS BIGINT) AS chars,
           |  CAST(sum(c.n_bpe_tokens) AS BIGINT) AS bpe_tokens,
           |  CASE WHEN sum(c.n_bpe_tokens) > 0
           |    THEN round(sum(d.n_chars)::DOUBLE / sum(c.n_bpe_tokens), 4)
           |  END AS chars_per_token
           |FROM documents d JOIN cnts c ON d.doc_id = c.doc_id
           |GROUP BY 1""".stripMargin,
      // the pretokenizer pinned cross-engine where it matters: CJK per
      // code point, punctuation split off, digit runs separate —
      // position included so the hash pins order, not just the bag
      "text_bpe_pretokens" ->
        s"""WITH $mixedCte,
           |tok AS (SELECT doc_id, ${pretokSql("text")} AS toks FROM mixed)
           |SELECT doc_id, CAST(i AS BIGINT) AS pos, toks[i] AS pretoken
           |FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
           |      FROM tok)""".stripMargin,
      // the full fit+apply chain over the CJK+punctuation corpus — the
      // acceptance gate for the pretokenizer as a capability (under \s+
      // tokenization this corpus degenerates to sentence-words)
      "text_bpe_compression_cjk" ->
        s"""WITH $mixedCte,
           |${bpeChainFor("mixed")},
           |cnts AS (
           |WITH ${tokensBodyFor(
                "(SELECT doc_id, variant, CAST(length(text) AS BIGINT) " +
                  "AS n_chars, text FROM mixed)",
                Seq("variant", "n_chars"))})
           |SELECT variant, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_chars) AS BIGINT) AS chars,
           |  CAST(sum(n_bpe_tokens) AS BIGINT) AS bpe_tokens,
           |  CASE WHEN sum(n_bpe_tokens) > 0
           |    THEN round(sum(n_chars)::DOUBLE / sum(n_bpe_tokens), 4)
           |  END AS chars_per_token
           |FROM cnts GROUP BY 1""".stripMargin,
      // the vocabulary artifact: w12 IS the fully merged word table, so
      // the weighted piece counts fall straight out of it
      "text_bpe_vocab" ->
        s"""WITH ${bpeChainFor("documents")}
           |SELECT piece AS token, CAST(sum(freq) AS BIGINT) AS n_occurrences
           |FROM (SELECT unnest(list_filter(
           |        string_split(ws, chr(31) || chr(31)), x -> x <> '')) AS piece,
           |      freq FROM w$BpeK)
           |GROUP BY 1""".stripMargin,
      // tokenizer -> shards: the BPE token counts packed into 4096-token
      // shards in doc_id order (pack_sequences' tokens-before floor-div
      // convention), aggregated to the writer's manifest
      "shard_manifest" ->
        s"""WITH cnts AS (SELECT doc_id, n_bpe_tokens FROM ($tokensSql)),
           |sums AS (
           |  SELECT doc_id, n_bpe_tokens,
           |    CAST(floor((sum(n_bpe_tokens) OVER (ORDER BY doc_id
           |        ROWS UNBOUNDED PRECEDING) - n_bpe_tokens)::DOUBLE
           |      / 4096.0) AS BIGINT) AS shard_id
           |  FROM cnts)
           |SELECT shard_id, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_bpe_tokens) AS BIGINT) AS n_tokens,
           |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
           |FROM sums GROUP BY 1""".stripMargin)
  }

  /** In-engine classifier fit replayed as an unrolled 3-iteration CTE
    * chain (mirrored from [[graft.operators.TextAnalysis.trainHashedLinear]]):
    * per-doc residual = round(y - mean of bucket weights over tokens, 6),
    * per-bucket gradient = round(sum(residual / n_tokens), 6), update =
    * round(w + lr * g, 6) — every sum lands on the 6-dp grid before the
    * next stage reads it, so partition-order float noise never escapes. */
  private val ClfD = 64
  private val ClfLr = "0.002"
  private val ClfIters = 3

  private val classifierFitSql: String = {
    val bucket =
      s"CAST(CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % $ClfD AS INT)"
    val ctes = Seq.newBuilder[String]
    ctes += s"""q AS MATERIALIZED (
      |  SELECT doc_id, CAST(lang = 'en' AS INT)::DOUBLE AS y,
      |    list_transform(list_filter(string_split_regex(text, '\\s+'),
      |      x -> len(x) > 0), tok -> $bucket) AS bks
      |  FROM documents)""".stripMargin
    ctes += s"w0 AS (SELECT list_transform(range(0, $ClfD), i -> 0.0::DOUBLE) AS w)"
    for (i <- 1 to ClfIters) {
      val p = i - 1
      ctes += s"""r$i AS MATERIALIZED (
        |  SELECT doc_id, bks, len(bks) AS n,
        |    round(y - CASE WHEN len(bks) = 0 THEN 0.0
        |      ELSE list_sum(list_transform(bks, b -> w[b+1])) / len(bks)
        |      END, 6) AS r
        |  FROM q, w$p)""".stripMargin
      // gradient in integer MICRO units: round(r * 1e6 / n) is an exact
      // BIGINT addend, so the per-bucket sum is order-free across engines
      // (a double sum(r / n) straddled the 6-dp round at sf0.001)
      ctes += s"""g$i AS MATERIALIZED (
        |  SELECT b, CAST(sum(CAST(round(r * 1e6 / n) AS BIGINT)) AS BIGINT) AS g
        |  FROM (SELECT unnest(bks) AS b, r, n FROM r$i WHERE n > 0)
        |  GROUP BY 1)""".stripMargin
      ctes += s"""ga$i AS (
        |  SELECT list(coalesce(g, 0) ORDER BY i) AS ga
        |  FROM range(0, $ClfD) t(i) LEFT JOIN g$i ON i = b)""".stripMargin
      ctes += s"""w$i AS (
        |  SELECT list_transform(range(1, ${ClfD + 1}),
        |    j -> round(w[j] + $ClfLr * (ga[j] / 1000000.0), 6)) AS w
        |  FROM w$p, ga$i)""".stripMargin
    }
    "WITH " + ctes.result().mkString(",\n") +
      s"""
         |SELECT CAST(i AS INT) AS bucket, w[i+1] AS weight
         |FROM w$ClfIters, range(0, $ClfD) t(i)""".stripMargin
  }

  /** Cross-operator compositions replayed by nesting the component
    * oracles as subqueries (DuckDB WITH-in-derived-table). */
  val composed: Map[String, String] = Map(
    "text_classifier_fit" -> classifierFitSql,
    // recall@10 of the IVF tier vs the exact brute-force top-10: both
    // component oracles verbatim, matched on (q_id, neighbor_id)
    "ann_recall" ->
      s"""WITH exact AS (SELECT q_id, neighbor_id FROM (
         |${trainingData("ann_cosine_topk")})),
         |approx AS (SELECT q_id, neighbor_id FROM (
         |${trainingData("ann_ivf")}))
         |SELECT e.q_id, CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
         |  round(count(a.neighbor_id) / 10.0, 6) AS recall
         |FROM exact e LEFT JOIN approx a
         |  ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
         |GROUP BY 1""".stripMargin,

    // persisted-index IVF search has the SAME result contract as the
    // in-memory tier — the ann_ivf replay verbatim
    "ann_ivf_index" -> trainingData("ann_ivf"),

    // one-scan column profiler: the same melt-then-aggregate shape as
    // the Spark side, strings rendered with the EAV cast conventions
    "profile_columns" ->
      """WITH eav AS (
        |  SELECT attribute, value FROM (
        |    SELECT 'c_name' AS attribute, c_name AS value FROM customer
        |    UNION ALL SELECT 'c_mktsegment', c_mktsegment FROM customer
        |    UNION ALL SELECT 'c_acctbal', CAST(c_acctbal AS VARCHAR) FROM customer
        |    UNION ALL SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer))
        |SELECT attribute,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(value) AS BIGINT) AS n_values,
        |  CAST(count(*) - count(value) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
        |  min(value) AS v_min, max(value) AS v_max
        |FROM eav GROUP BY 1""".stripMargin)
}
