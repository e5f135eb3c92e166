package graft.contract

import graft.llm.{Dedup, TextAnalysis}

/** DuckDB-SQL mirrors of the graft.llm text/dedup operators, generated
  * from the SAME Scala constants (stopword lists, hash constants, band
  * layout) so the two sides cannot drift. All arithmetic is integer or
  * identical-order double — the oracle matches bitwise.
  */
object TextSql {

  private def strList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** string tokens CTE: t(doc_id, text, toks) */
  val toksCte: String =
    "SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents"

  /** polynomial rolling hash of a string expression (BIGINT, exact):
    * fold (acc*31 + ord) % FpMod with acc0=0 via list_prepend. */
  def polyHashSql(strExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($strExpr)+1), j -> ord($strExpr[j::INT]))), " +
      s"(acc, c) -> (acc*31 + c) % ${TextAnalysis.FpMod})"

  /** distinct word-bigram shingles of `toks` (empty list when <2 tokens) */
  val shinglesExpr: String =
    "CASE WHEN len(toks) >= 2 THEN list_distinct(list_transform(range(1, len(toks)), " +
      "i -> toks[i::INT] || ' ' || toks[(i+1)::INT])) ELSE CAST([] AS VARCHAR[]) END"

  val textStatsSql: String = {
    val stop = strList(TextAnalysis.Stopwords)
    s"WITH t AS ($toksCte), " +
      "s AS (SELECT doc_id, len(text) AS n_chars, len(toks) AS n_tokens, " +
      "list_sum(list_transform(toks, t -> len(t))) AS sum_len, " +
      s"len(list_filter(toks, t -> list_contains($stop, t))) AS stop_hits FROM t) " +
      "SELECT doc_id, n_chars, n_tokens, sum_len/n_tokens AS avg_token_len, " +
      "stop_hits/n_tokens AS stop_ratio, " +
      "least(1.0, n_tokens/100.0)*0.5 + stop_hits/n_tokens*0.3 + " +
      "least(1.0, (sum_len/n_tokens)/8.0)*0.2 AS quality " +
      "FROM s ORDER BY doc_id"
  }

  val langIdSql: String = {
    val hitCols = TextAnalysis.LangStopwords.map { case (lang, words) =>
      s"len(list_filter(toks, t -> list_contains(${strList(words)}, t))) AS h_$lang"
    }.mkString(", ")
    val langs = TextAnalysis.LangStopwords.map(_._1)
    val zero = langs.map(l => s"h_$l").mkString(" + ") + " = 0"
    val cases = langs.dropRight(1).map { l =>
      val wins = langs.filter(_ != l).map(o => s"h_$l >= h_$o").mkString(" AND ")
      s"WHEN $wins THEN '$l'"
    }.mkString(" ")
    s"WITH t AS ($toksCte), h AS (SELECT doc_id, $hitCols FROM t) " +
      s"SELECT doc_id, CASE WHEN $zero THEN 'und' $cases ELSE '${langs.last}' END AS lang_pred " +
      "FROM h ORDER BY doc_id"
  }

  /** Mirror of TextAnalysis.mixedLanguageDocs: the chunk CTEs + the
    * langIdSql hit/argmax logic per CHUNK, then the (doc, lang) count
    * table with the majority rank and the exact-grid mixed fraction. */
  def mixedLangSql(chunkTokens: Int): String = {
    val hitCols = TextAnalysis.LangStopwords.map { case (lang, words) =>
      s"len(list_filter(string_split(chunk_text, ' '), " +
        s"t -> list_contains(${strList(words)}, t))) AS h_$lang"
    }.mkString(", ")
    val langs = TextAnalysis.LangStopwords.map(_._1)
    val zero = langs.map(l => s"h_$l").mkString(" + ") + " = 0"
    val cases = langs.dropRight(1).map { l =>
      val wins = langs.filter(_ != l).map(o => s"h_$l >= h_$o").mkString(" AND ")
      s"WHEN $wins THEN '$l'"
    }.mkString(" ")
    s"WITH ${chunkCtes(chunkTokens)}, " +
      s"h AS (SELECT doc_id, $hitCols FROM ch), " +
      s"cl AS (SELECT doc_id, CASE WHEN $zero THEN 'und' $cases " +
      s"ELSE '${langs.last}' END AS clang FROM h), " +
      "cnt AS (SELECT doc_id, clang, CAST(count(*) AS BIGINT) AS c FROM cl GROUP BY 1, 2), " +
      "r AS (SELECT doc_id, clang, c, " +
      "CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_chunks, " +
      "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, clang) AS rn FROM cnt) " +
      "SELECT doc_id, clang AS major_lang, c AS n_major, n_chunks, " +
      "CAST(n_chunks - c AS DOUBLE) / CAST(n_chunks AS DOUBLE) AS mixed_frac " +
      "FROM r WHERE rn = 1 ORDER BY doc_id"
  }

  val fingerprintSql: String =
    s"SELECT doc_id, CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END AS fp " +
      "FROM documents ORDER BY doc_id"

  val dedupExactSql: String =
    "SELECT md5(text) AS text_md5, min(doc_id) AS keep_id, count(*) AS n_copies " +
      "FROM documents GROUP BY text ORDER BY text_md5"

  /** mirror of TextAnalysis.chunk: chunk starts every stride tokens,
    * 1-based inclusive list_slice == Spark's slice(toks, start+1, len) */
  def chunksSql(chunkTokens: Int, overlap: Int): String = {
    val stride = chunkTokens - overlap
    s"WITH t AS ($toksCte), " +
      s"st AS (SELECT doc_id, toks, unnest(range(0, len(toks), $stride)) AS start FROM t) " +
      s"SELECT doc_id, start // $stride AS chunk_id, " +
      s"array_to_string(list_slice(toks, (start+1)::INT, (start+$chunkTokens)::INT), ' ') AS chunk_text, " +
      s"CAST(least(len(toks) - start, $chunkTokens) AS BIGINT) AS n_tokens " +
      "FROM st ORDER BY doc_id, chunk_id"
  }

  /** Shared chunk-table CTE for the sub-document dedup mirrors:
    * ch(doc_id, chunk_id, chunk_text) — the disjoint k-token windows of
    * TextAnalysis.chunkTable (chunk(…, overlap = 0)). */
  private def chunkCtes(k: Int): String =
    s"t AS ($toksCte), " +
      s"st AS (SELECT doc_id, toks, unnest(range(0, len(toks), $k)) AS start FROM t), " +
      s"ch AS (SELECT doc_id, start // $k AS chunk_id, " +
      s"array_to_string(list_slice(toks, (start+1)::INT, (start+$k)::INT), ' ') AS chunk_text FROM st)"

  /** Reassembled-text CTE over a kept(doc_id, chunk_id, chunk_text)
    * relation: re(doc_id, n_kept, text) in chunk order. */
  private def reCte: String =
    "re AS (SELECT doc_id, count(*) AS n_kept, " +
      "string_agg(chunk_text, ' ' ORDER BY chunk_id) AS text " +
      "FROM kept GROUP BY doc_id)"

  /** Shared reassembly tail over `re`: left-joined FROM the documents
    * table so fully-emptied documents — and null-text documents that
    * produced no chunks at all — survive with counts 0 and text = ''.
    * Pure integer/string arithmetic — bitwise with no float
    * discipline. */
  private def reassembleTail: String =
    "tot AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY doc_id) " +
      "SELECT d0.doc_id, coalesce(n_chunks, 0) AS n_chunks, " +
      "coalesce(n_kept, 0) AS n_kept, " +
      "coalesce(re.text, '') AS text " +
      "FROM documents d0 LEFT JOIN tot ON d0.doc_id = tot.doc_id " +
      "LEFT JOIN re ON d0.doc_id = re.doc_id ORDER BY d0.doc_id"

  /** First-global-occurrence keeper + reassembled-text CTEs shared by
    * the chunk-dedup mirror and the composed curation mirror — ONE
    * definition of the keeper rule (row_number over (doc_id, chunk_id)
    * order ≡ Spark's min(struct) keeper), so the single-operator and
    * composed oracles cannot drift. Emits kept(doc_id, chunk_id,
    * chunk_text) and re(doc_id, n_kept, text). */
  private def dedupKeptCtes: String =
    "rk AS (SELECT doc_id, chunk_id, chunk_text, " +
      "row_number() OVER (PARTITION BY chunk_text ORDER BY doc_id, chunk_id) AS rn FROM ch), " +
      "kept AS (SELECT doc_id, chunk_id, chunk_text FROM rk WHERE rn = 1), " +
      reCte

  /** Mirror of TextAnalysis.chunkDedup: the first global occurrence of
    * each chunk survives (see [[dedupKeptCtes]]), then reassembly. */
  def chunkDedupSql(k: Int): String =
    s"WITH ${chunkCtes(k)}, $dedupKeptCtes, $reassembleTail"

  /** Mirror of TextAnalysis.dropBoilerplateChunks: chunks in >= minDocs
    * distinct documents are removed everywhere (NOT EXISTS ≡ Spark's
    * left-anti join), then reassembly. */
  def boilerplateSql(k: Int, minDocs: Long): String =
    s"WITH ${chunkCtes(k)}, " +
      "bl AS (SELECT chunk_text FROM ch GROUP BY chunk_text " +
      s"HAVING count(DISTINCT doc_id) >= $minDocs), " +
      "kept AS (SELECT doc_id, chunk_id, chunk_text FROM ch " +
      "WHERE NOT EXISTS (SELECT 1 FROM bl WHERE bl.chunk_text = ch.chunk_text)), " +
      s"$reCte, $reassembleTail"

  /** shared CTE prefix for shingle-based queries:
    * d(doc_id, sh), ex(doc_id, s), sizes(doc_id, n) */
  private val shingleCtes: String =
    s"t AS ($toksCte), " +
      s"d AS (SELECT doc_id, $shinglesExpr AS sh FROM t), " +
      "ex AS (SELECT doc_id, unnest(sh) AS s FROM d), " +
      "sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id)"

  /** Mirror of Dedup.jaccardPairs WITH its df-cap candidate gate: the
    * same shingle hash (polyHashSql == shingleHash), the same df <= cap
    * keep-set, the same capped-intersection count bound
    * ic >= t*(na+nb)/(1+t) (integer hash-row counts on both sides, so
    * the gate agrees by construction), then exact string-shingle
    * Jaccard for the survivors — the verification step Spark runs. */
  def dedupJaccardSql(threshold: Double, dfCap: Long): String =
    s"WITH $shingleCtes, " +
      s"hx AS (SELECT doc_id, ${polyHashSql("s")} AS h FROM ex), " +
      s"kx AS (SELECT doc_id, h FROM hx JOIN (SELECT h FROM hx GROUP BY h " +
      s"HAVING count(*) <= $dfCap) kh USING (h)), " +
      "ci AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ic " +
      "FROM kx a JOIN kx b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
      "cand AS (SELECT da, db FROM ci " +
      "JOIN sizes cna ON da = cna.doc_id JOIN sizes cnb ON db = cnb.doc_id " +
      s"WHERE ic >= $threshold * (CAST(cna.n AS DOUBLE) + CAST(cnb.n AS DOUBLE)) / (1.0 + $threshold)), " +
      "inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i " +
      "FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id " +
      "JOIN cand c ON c.da = a.doc_id AND c.db = b.doc_id GROUP BY 1, 2) " +
      "SELECT da, db, i/(na.n + nb.n - i) AS jaccard " +
      "FROM inter JOIN sizes na ON da = na.doc_id JOIN sizes nb ON db = nb.doc_id " +
      s"WHERE i/(na.n + nb.n - i) >= $threshold ORDER BY da, db"

  def dedupMinhashSql(threshold: Double): String = {
    val sigEntries = Dedup.HashAB.map { case (a, b) =>
      s"list_min(list_transform(hv, h -> ($a*h + $b) % ${TextAnalysis.FpMod}))"
    }.mkString("[", ", ", "]")
    val bandVals = (0 until Dedup.Bands).map(b => s"($b)").mkString(", ")
    // band key: the RowsPerBand signature entries of band b, comma-joined
    val keyExpr = (0 until Dedup.RowsPerBand).map { r =>
      s"CAST(sig[(band*${Dedup.RowsPerBand} + ${r + 1})::INT] AS VARCHAR)"
    }.mkString(" || ',' || ")
    s"WITH $shingleCtes, " +
      s"hs AS (SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hv " +
      "FROM d WHERE len(sh) > 0), " +
      s"sig AS (SELECT doc_id, $sigEntries AS sig FROM hs), " +
      s"bands AS (SELECT doc_id, band, $keyExpr AS key FROM sig, (VALUES $bandVals) bn(band)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), " +
      "iv AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i " +
      "FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id " +
      "JOIN cand c ON c.da = a.doc_id AND c.db = b.doc_id GROUP BY 1, 2) " +
      "SELECT da, db, i/(na.n + nb.n - i) AS jaccard " +
      "FROM iv JOIN sizes na ON da = na.doc_id JOIN sizes nb ON db = nb.doc_id " +
      s"WHERE i/(na.n + nb.n - i) >= $threshold ORDER BY da, db"
  }

  /** Mirror of Dedup.minhashEstimatePairs: same signatures/banding as
    * dedupMinhashSql, n_match = per-position signature agreement,
    * est = n/16 (exact binary division — no float tolerance needed). */
  def minhashEstimateSql(minMatch: Int): String = {
    val sigEntries = Dedup.HashAB.map { case (a, b) =>
      s"list_min(list_transform(hv, h -> ($a*h + $b) % ${TextAnalysis.FpMod}))"
    }.mkString("[", ", ", "]")
    val bandVals = (0 until Dedup.Bands).map(b => s"($b)").mkString(", ")
    val keyExpr = (0 until Dedup.RowsPerBand).map { r =>
      s"CAST(sig[(band*${Dedup.RowsPerBand} + ${r + 1})::INT] AS VARCHAR)"
    }.mkString(" || ',' || ")
    val matchExpr = Dedup.HashAB.indices.map(j =>
      s"CASE WHEN sa.sig[${j + 1}] = sb.sig[${j + 1}] THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"WITH $shingleCtes, " +
      s"hs AS (SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hv " +
      "FROM d WHERE len(sh) > 0), " +
      s"sig AS (SELECT doc_id, $sigEntries AS sig FROM hs), " +
      s"bands AS (SELECT doc_id, band, $keyExpr AS key FROM sig, (VALUES $bandVals) bn(band)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), " +
      s"m AS (SELECT c.da, c.db, $matchExpr AS nm " +
      "FROM cand c JOIN sig sa ON sa.doc_id = c.da JOIN sig sb ON sb.doc_id = c.db) " +
      "SELECT da, db, CAST(nm AS BIGINT) AS n_match, " +
      s"CAST(nm AS DOUBLE) / ${Dedup.HashAB.length} AS est_jaccard " +
      s"FROM m WHERE nm >= $minMatch ORDER BY da, db"
  }

  /** Mirror of Dedup.incrementalMinhash with batch = documents whose
    * doc_id % `batchMod` = 0 and corpus = the rest: the same band
    * layout on both sides, candidates only from batch-band x
    * corpus-band bucket collisions, exact string-shingle verification. */
  def incrementalMinhashSql(threshold: Double, batchMod: Int): String = {
    val sigEntries = Dedup.HashAB.map { case (a, b) =>
      s"list_min(list_transform(hv, h -> ($a*h + $b) % ${TextAnalysis.FpMod}))"
    }.mkString("[", ", ", "]")
    val bandVals = (0 until Dedup.Bands).map(b => s"($b)").mkString(", ")
    val keyExpr = (0 until Dedup.RowsPerBand).map { r =>
      s"CAST(sig[(band*${Dedup.RowsPerBand} + ${r + 1})::INT] AS VARCHAR)"
    }.mkString(" || ',' || ")
    s"WITH $shingleCtes, " +
      s"hs AS (SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hv " +
      "FROM d WHERE len(sh) > 0), " +
      s"sig AS (SELECT doc_id, $sigEntries AS sig FROM hs), " +
      s"bands AS (SELECT doc_id, band, $keyExpr AS key FROM sig, (VALUES $bandVals) bn(band)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.key = b.key " +
      s"AND a.doc_id % $batchMod = 0 AND b.doc_id % $batchMod <> 0), " +
      "iv AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i " +
      "FROM ex a JOIN ex b ON a.s = b.s " +
      "JOIN cand c ON c.da = a.doc_id AND c.db = b.doc_id GROUP BY 1, 2) " +
      "SELECT da AS batch_id, db AS corpus_id, i/(na.n + nb.n - i) AS jaccard " +
      "FROM iv JOIN sizes na ON da = na.doc_id JOIN sizes nb ON db = nb.doc_id " +
      s"WHERE i/(na.n + nb.n - i) >= $threshold ORDER BY batch_id, corpus_id"
  }

  /** Mirror of Dedup.incrementalEditPairs with batch = documents whose
    * doc_id % `batchMod` = 0 and corpus = the rest: the
    * incrementalMinhashSql candidate form (batch-band x corpus-band
    * bucket collisions), verified by levenshtein like editPairsSql.
    * Same cross-engine notes as editPairsSql (ASCII corpus, exact
    * single-division edit_sim). */
  def incrementalEditPairsSql(maxDist: Int, batchMod: Int): String = {
    val sigEntries = Dedup.HashAB.map { case (a, b) =>
      s"list_min(list_transform(hv, h -> ($a*h + $b) % ${TextAnalysis.FpMod}))"
    }.mkString("[", ", ", "]")
    val bandVals = (0 until Dedup.Bands).map(b => s"($b)").mkString(", ")
    val keyExpr = (0 until Dedup.RowsPerBand).map { r =>
      s"CAST(sig[(band*${Dedup.RowsPerBand} + ${r + 1})::INT] AS VARCHAR)"
    }.mkString(" || ',' || ")
    s"WITH $shingleCtes, " +
      s"hs AS (SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hv " +
      "FROM d WHERE len(sh) > 0), " +
      s"sig AS (SELECT doc_id, $sigEntries AS sig FROM hs), " +
      s"bands AS (SELECT doc_id, band, $keyExpr AS key FROM sig, (VALUES $bandVals) bn(band)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.key = b.key " +
      s"AND a.doc_id % $batchMod = 0 AND b.doc_id % $batchMod <> 0), " +
      "lv AS (SELECT da, db, CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist, " +
      "CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS maxlen " +
      "FROM cand JOIN documents ta ON ta.doc_id = da JOIN documents tb ON tb.doc_id = db) " +
      "SELECT da AS batch_id, db AS corpus_id, dist, " +
      "CASE WHEN maxlen = 0 THEN 1.0 " +
      "ELSE CAST(maxlen - dist AS DOUBLE) / CAST(maxlen AS DOUBLE) END AS edit_sim " +
      s"FROM lv WHERE dist <= $maxDist ORDER BY batch_id, corpus_id"
  }

  /** Mirror of Dedup.editPairs: the SAME band-collision candidates as
    * dedupMinhashSql, verified by levenshtein distance over the raw
    * texts instead of shingle Jaccard. DuckDB's `levenshtein` is
    * unthresholded, so the mirror computes the full distance and
    * filters dist <= maxDist — equivalent to Spark's banded DP's
    * (-1-past-threshold, filter >= 0) contract by definition of the
    * threshold. Distances are byte-counted in DuckDB vs char-counted
    * in Spark: identical on the all-ASCII contract corpus (empirically
    * re-verified by this query's own hash compare every round).
    * edit_sim = ONE division of two exact BIGINTs (maxlen > 0 always:
    * candidates require non-empty shingle sets) — bitwise with no
    * rounding discipline. */
  def editPairsSql(maxDist: Int): String = {
    val sigEntries = Dedup.HashAB.map { case (a, b) =>
      s"list_min(list_transform(hv, h -> ($a*h + $b) % ${TextAnalysis.FpMod}))"
    }.mkString("[", ", ", "]")
    val bandVals = (0 until Dedup.Bands).map(b => s"($b)").mkString(", ")
    val keyExpr = (0 until Dedup.RowsPerBand).map { r =>
      s"CAST(sig[(band*${Dedup.RowsPerBand} + ${r + 1})::INT] AS VARCHAR)"
    }.mkString(" || ',' || ")
    s"WITH $shingleCtes, " +
      s"hs AS (SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hv " +
      "FROM d WHERE len(sh) > 0), " +
      s"sig AS (SELECT doc_id, $sigEntries AS sig FROM hs), " +
      s"bands AS (SELECT doc_id, band, $keyExpr AS key FROM sig, (VALUES $bandVals) bn(band)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id), " +
      "lv AS (SELECT da, db, CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist, " +
      "CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS maxlen " +
      "FROM cand JOIN documents ta ON ta.doc_id = da JOIN documents tb ON tb.doc_id = db) " +
      "SELECT da, db, dist, " +
      "CASE WHEN maxlen = 0 THEN 1.0 " +
      "ELSE CAST(maxlen - dist AS DOUBLE) / CAST(maxlen AS DOUBLE) END AS edit_sim " +
      s"FROM lv WHERE dist <= $maxDist ORDER BY da, db"
  }

  /** Mirror of TextAnalysis.qualityWeightedSample + per-lang integer
    * aggregates (the quality arithmetic is textStatsSql's, verbatim). */
  def qualityWeightedSampleSql(buckets: Int): String = {
    val stop = strList(TextAnalysis.Stopwords)
    "WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS toks FROM documents), " +
      "s AS (SELECT doc_id, lang, len(toks) AS n_tokens, " +
      "list_sum(list_transform(toks, t -> len(t))) AS sum_len, " +
      s"len(list_filter(toks, t -> list_contains($stop, t))) AS stop_hits, " +
      s"(CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END) AS h FROM t), " +
      "q AS (SELECT *, least(1.0, n_tokens/100.0)*0.5 + stop_hits/n_tokens*0.3 + " +
      "least(1.0, (sum_len/n_tokens)/8.0)*0.2 AS quality FROM s) " +
      "SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens, " +
      "min(doc_id) AS min_id, max(doc_id) AS max_id " +
      s"FROM q WHERE (h % $buckets) < quality * $buckets " +
      "GROUP BY lang ORDER BY lang"
  }

  val simhashSql: String = {
    val terms = (0 until 20).map { bit =>
      s"CASE WHEN 2*len(list_filter(hv, h -> (h >> $bit) & 1 = 1)) >= len(hv) " +
        s"THEN CAST(${1L << bit} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"WITH t AS ($toksCte), d AS (SELECT doc_id, $shinglesExpr AS sh FROM t), " +
      s"hs AS (SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hv FROM d) " +
      s"SELECT doc_id, CASE WHEN len(sh) = 0 THEN 0 ELSE $terms END AS simhash " +
      "FROM hs ORDER BY doc_id"
  }

  /** Mirror of TextAnalysis.pipelineFilter: quality + language filter,
    * then exact-dedup keep-lowest-id. n_tokens/quality are constant
    * within a text group, so min() equals Spark's first(). */
  def pipelineFilterSql(minQuality: Double, lang: String): String = {
    val stop = strList(TextAnalysis.Stopwords)
    val hitCols = TextAnalysis.LangStopwords.map { case (l, words) =>
      s"len(list_filter(toks, t -> list_contains(${strList(words)}, t))) AS h_$l"
    }.mkString(", ")
    val langs = TextAnalysis.LangStopwords.map(_._1)
    val zero = langs.map(l => s"h_$l").mkString(" + ") + " = 0"
    val cases = langs.dropRight(1).map { l =>
      val wins = langs.filter(_ != l).map(o => s"h_$l >= h_$o").mkString(" AND ")
      s"WHEN $wins THEN '$l'"
    }.mkString(" ")
    s"WITH t AS ($toksCte), " +
      "s AS (SELECT doc_id, text, len(toks) AS n_tokens, " +
      "list_sum(list_transform(toks, t -> len(t))) AS sum_len, " +
      s"len(list_filter(toks, t -> list_contains($stop, t))) AS stop_hits, $hitCols FROM t), " +
      "q AS (SELECT doc_id, text, n_tokens, " +
      "least(1.0, n_tokens/100.0)*0.5 + stop_hits/n_tokens*0.3 + " +
      "least(1.0, (sum_len/n_tokens)/8.0)*0.2 AS q, " +
      s"CASE WHEN $zero THEN 'und' $cases ELSE '${langs.last}' END AS lang_pred FROM s) " +
      "SELECT min(doc_id) AS keep_id, count(*) AS n_copies, " +
      "min(n_tokens) AS n_tokens, min(q) AS quality " +
      s"FROM q WHERE lang_pred = '$lang' AND q >= $minQuality " +
      "GROUP BY text ORDER BY keep_id"
  }

  /** Mirror of TextAnalysis.contentSplit + per-(lang, split) counts. */
  def trainSplitSql(trainBuckets: Int, buckets: Int): String =
    "WITH f AS (SELECT lang, CASE WHEN " +
      s"(CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END) % $buckets < $trainBuckets " +
      "THEN 'train' ELSE 'test' END AS split FROM documents) " +
      "SELECT lang, split, count(*) AS n_docs FROM f GROUP BY lang, split ORDER BY lang, split"

  /** Mirror of Dedup.leakageSafeSplit over the minhash pair set: the
    * dedup_components recursive-CTE closure gives each doc its cluster
    * keeper (absent = itself), the split hashes the KEEPER's text with
    * the contentSplit fingerprint, and cross_pairs re-counts straddling
    * minhash pairs (0 by construction — but counted, not asserted, so
    * the property crosses the bitwise hash). */
  def safeSplitSql(threshold: Double, trainBuckets: Int, buckets: Int): String =
    s"WITH RECURSIVE pairs AS (SELECT da, db FROM (${dedupMinhashSql(threshold)}) mp), " +
      "sym AS (SELECT da AS a, db AS b FROM pairs UNION SELECT db AS a, da AS b FROM pairs), " +
      "reach AS (SELECT a, b FROM sym " +
      "UNION SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a WHERE s.b <> r.a), " +
      "comp AS (SELECT a AS doc_id, least(a, min(b)) AS keep_id FROM reach GROUP BY a), " +
      "k AS (SELECT d.doc_id, coalesce(c.keep_id, d.doc_id) AS keep_id " +
      "FROM documents d LEFT JOIN comp c USING (doc_id)), " +
      "sp AS (SELECT k.doc_id, k.keep_id, CASE WHEN " +
      s"(CASE WHEN len(t.text) = 0 THEN 0 ELSE ${polyHashSql("t.text")} END) % $buckets < $trainBuckets " +
      "THEN 'train' ELSE 'test' END AS split FROM k JOIN documents t ON t.doc_id = k.keep_id), " +
      "x AS (SELECT count(*) AS cross_pairs FROM pairs p " +
      "JOIN sp a ON p.da = a.doc_id JOIN sp b ON p.db = b.doc_id WHERE a.split <> b.split) " +
      "SELECT split, count(*) AS n_docs, count(DISTINCT keep_id) AS n_clusters, " +
      "(SELECT cross_pairs FROM x) AS cross_pairs " +
      "FROM sp GROUP BY split ORDER BY split"

  /** Mirror of TextAnalysis.topNgrams: per-lang top-k word bigrams by
    * document frequency, ties to the lexicographically-smaller bigram. */
  def ngramTopKSql(k: Int): String =
    "WITH t AS (SELECT lang, string_split(text, ' ') AS toks FROM documents), " +
      s"d AS (SELECT lang, $shinglesExpr AS sh FROM t), " +
      "ex AS (SELECT lang, unnest(sh) AS ngram FROM d), " +
      "c AS (SELECT lang, ngram, count(*) AS n_docs FROM ex GROUP BY lang, ngram), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_docs DESC, ngram) AS rn FROM c) " +
      s"SELECT lang, ngram, n_docs, rn FROM r WHERE rn <= $k ORDER BY lang, rn"

  /** Mirror of Dedup.simhashPairs: the simhash CTE, chunk banding from
    * the SAME chunk constants, bucket-collision candidates, exact
    * hamming filter — bit arithmetic only, so the match is exact. */
  def simhashPairsSql(maxHamming: Int): String = {
    val mask = (1 << Dedup.SimhashChunkBits) - 1
    val bandVals = (0 until Dedup.SimhashChunks).map(c => s"($c)").mkString(", ")
    s"WITH sig AS (SELECT doc_id, simhash FROM ($simhashSql) s0), " +
      s"bands AS (SELECT doc_id, simhash, chunk, " +
      s"(simhash >> (chunk*${Dedup.SimhashChunkBits})) & $mask AS key " +
      s"FROM sig, (VALUES $bandVals) ch(chunk)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, " +
      "a.simhash AS sa, b.simhash AS sb FROM bands a JOIN bands b " +
      "ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id) " +
      "SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming " +
      s"FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHamming ORDER BY da, db"
  }

  /** Mirror of Dedup.simhashWide: 60 affine bit functions over the
    * shared polyhash (the (a, c) constants interpolate from the SAME
    * Scala formulas), majority-vote per bit, integer arithmetic
    * throughout — so the signature matches bit-for-bit. */
  val simhashWideSql: String = {
    import graft.llm.TextAnalysis.FpMod
    val terms = (0 until Dedup.SimhashWideBits).map { b =>
      s"CASE WHEN 2*len(list_filter(hv, h -> 2*((h*${Dedup.wideA(b)} + ${Dedup.wideC(b)}) % $FpMod) >= $FpMod)) >= len(hv) " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    s"WITH t AS ($toksCte), d AS (SELECT doc_id, $shinglesExpr AS sh FROM t), " +
      s"hs AS (SELECT doc_id, sh, list_transform(sh, s -> ${polyHashSql("s")}) AS hv FROM d) " +
      s"SELECT doc_id, CASE WHEN len(sh) = 0 THEN 0 ELSE $terms END AS simhash " +
      "FROM hs ORDER BY doc_id"
  }

  /** Mirror of Dedup.simhashPairsWide: the wide-signature CTE, 4×15-bit
    * chunk banding from the SAME constants, bucket-collision candidates,
    * exact hamming filter. */
  def simhashPairsWideSql(maxHamming: Int): String = {
    val mask = (1L << Dedup.SimhashWideChunkBits) - 1
    val bandVals = (0 until Dedup.SimhashWideChunks).map(c => s"($c)").mkString(", ")
    s"WITH sig AS (SELECT doc_id, simhash FROM ($simhashWideSql) s0), " +
      s"bands AS (SELECT doc_id, simhash, chunk, " +
      s"(simhash >> (chunk*${Dedup.SimhashWideChunkBits})) & $mask AS key " +
      s"FROM sig, (VALUES $bandVals) ch(chunk)), " +
      "cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db, " +
      "a.simhash AS sa, b.simhash AS sb FROM bands a JOIN bands b " +
      "ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id) " +
      "SELECT da, db, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming " +
      s"FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHamming ORDER BY da, db"
  }

  /** Mirror of TextAnalysis.winnow: k-gram hashes, w-window minima,
    * distinct. Only full windows (len(hv) >= w) emit, like the Spark
    * side. */
  /** Shared winnow-fingerprint CTEs (t/g1/g/win): gram construction,
    * polyhash, window minima, full-window guard — single-sourced so
    * the q_winnow and q_winnow_pairs mirrors can never desync (the
    * tokenBudgetCtes pattern). */
  private def winnowCtes(k: Int, w: Int): String = {
    val gram = (0 until k).map(o => s"toks[(i+$o)::INT]").mkString(" || ' ' || ")
    s"t AS ($toksCte), " +
      s"g1 AS (SELECT doc_id, CASE WHEN len(toks) >= $k THEN " +
      s"list_transform(range(1, len(toks)-${k - 1}+1), i -> $gram) " +
      "ELSE CAST([] AS VARCHAR[]) END AS grams FROM t), " +
      s"g AS (SELECT doc_id, list_transform(grams, s -> ${polyHashSql("s")}) AS hv FROM g1), " +
      s"win AS (SELECT doc_id, unnest(list_transform(range(1, len(hv)-$w+2), " +
      s"i -> list_min(hv[i:i+${w - 1}]))) AS fp FROM g WHERE len(hv) >= $w)"
  }

  def winnowSql(k: Int, w: Int): String =
    s"WITH ${winnowCtes(k, w)} " +
      "SELECT DISTINCT doc_id, fp FROM win ORDER BY doc_id, fp"

  /** Mirror of Dedup.winnowPairs: the winnowSql fingerprint CTEs, the
    * same df-cap pruning, pair counts with a HAVING floor. */
  def winnowPairsSql(k: Int, w: Int, minShared: Long, dfCap: Long): String =
    s"WITH ${winnowCtes(k, w)}, " +
      "f AS (SELECT DISTINCT doc_id, fp FROM win), " +
      s"keep AS (SELECT fp FROM f GROUP BY fp HAVING count(*) >= 2 AND count(*) <= $dfCap), " +
      "kf AS (SELECT doc_id, fp FROM f JOIN keep USING (fp)) " +
      "SELECT a.doc_id AS da, b.doc_id AS db, CAST(count(*) AS BIGINT) AS n_shared " +
      "FROM kf a JOIN kf b ON a.fp = b.fp AND a.doc_id < b.doc_id " +
      s"GROUP BY 1, 2 HAVING count(*) >= $minShared ORDER BY da, db"

  /** Mirror of TextAnalysis.textrank: same symmetrized distinct edge
    * list, the same `iterations` unrolled as CTEs — every rank is a
    * scaled BIGINT and every operation integer (pr // deg shares,
    * (85·Σ) // 100 update), so the lattice walk matches bitwise with
    * no float discipline. */
  def textrankSql(iterations: Int, k: Int): String = {
    val s = TextAnalysis.TextrankScale
    val base = 15L * s / 100
    val iterCtes = (1 to iterations).map { i =>
      val prev = if (i == 1) "pr0" else s"it${i - 1}"
      s"it$i AS (SELECT e.dst AS w, $base + (85 * sum(p.pr // d.deg)) // 100 AS pr " +
        s"FROM edges e JOIN $prev p ON e.src = p.w JOIN deg d ON e.src = d.src " +
        "GROUP BY e.dst)"
    }.mkString(", ")
    s"WITH t AS ($toksCte), " +
      "bgp AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t), " +
      "bg AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM bgp WHERE toks[i] <> toks[i+1]), " +
      "edges AS (SELECT DISTINCT src, dst FROM " +
      "(SELECT w1 AS src, w2 AS dst FROM bg UNION ALL SELECT w2 AS src, w1 AS dst FROM bg)), " +
      "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src), " +
      s"pr0 AS (SELECT src AS w, CAST($s AS BIGINT) AS pr FROM deg), " +
      s"$iterCtes " +
      "SELECT w, pr, rn FROM (SELECT w, CAST(pr AS BIGINT) AS pr, " +
      s"ROW_NUMBER() OVER (ORDER BY pr DESC, w) AS rn FROM it$iterations) " +
      s"WHERE rn <= $k ORDER BY rn"
  }

  /** Per-document mirror of textrankSql: identical integer walk with
    * doc_id joining every key; top-k ranked per document. */
  def textrankPerDocSql(iterations: Int, k: Int): String = {
    val s = TextAnalysis.TextrankScale
    val base = 15L * s / 100
    val iterCtes = (1 to iterations).map { i =>
      val prev = if (i == 1) "pr0" else s"it${i - 1}"
      s"it$i AS (SELECT e.doc_id, e.dst AS w, $base + (85 * sum(p.pr // d.deg)) // 100 AS pr " +
        s"FROM edges e JOIN $prev p ON e.doc_id = p.doc_id AND e.src = p.w " +
        "JOIN deg d ON e.doc_id = d.doc_id AND e.src = d.src " +
        "GROUP BY e.doc_id, e.dst)"
    }.mkString(", ")
    s"WITH t AS ($toksCte), " +
      "bgp AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t), " +
      "bg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM bgp WHERE toks[i] <> toks[i+1]), " +
      "edges AS (SELECT DISTINCT doc_id, src, dst FROM " +
      "(SELECT doc_id, w1 AS src, w2 AS dst FROM bg " +
      "UNION ALL SELECT doc_id, w2 AS src, w1 AS dst FROM bg)), " +
      "deg AS (SELECT doc_id, src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY 1, 2), " +
      s"pr0 AS (SELECT doc_id, src AS w, CAST($s AS BIGINT) AS pr FROM deg), " +
      s"$iterCtes " +
      "SELECT doc_id, w, pr, rn FROM (SELECT doc_id, w, CAST(pr AS BIGINT) AS pr, " +
      "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pr DESC, w) AS rn " +
      s"FROM it$iterations) WHERE rn <= $k ORDER BY doc_id, rn"
  }

  val multimodalMetaSql: String =
    "SELECT doc_id, octet_length(CAST(text AS BLOB)) AS byte_len, md5(text) AS digest " +
      "FROM documents ORDER BY doc_id"

  /** Mirror of TextAnalysis.packSequences: the greedy per-shard fold as
    * a recursive CTE walking each shard's docs in doc_id order, carrying
    * (pack_id, acc) — pure integer arithmetic, so packs match the Spark
    * fold exactly. */
  def packSequencesSql(budget: Long, shards: Int): String =
    s"WITH RECURSIVE t AS (SELECT doc_id, doc_id % $shards AS shard, " +
      s"len(string_split(text, ' ')) AS n_tokens FROM documents), " +
      "o AS (SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM t), " +
      "p AS (" +
      "SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS pack_id, n_tokens AS acc " +
      "FROM o WHERE rn = 1 " +
      "UNION ALL " +
      "SELECT o.shard, o.rn, o.doc_id, o.n_tokens, " +
      s"CASE WHEN p.acc + o.n_tokens > $budget THEN p.pack_id + 1 ELSE p.pack_id END, " +
      s"CASE WHEN p.acc + o.n_tokens > $budget THEN o.n_tokens ELSE p.acc + o.n_tokens END " +
      "FROM p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1) " +
      "SELECT doc_id, CAST(shard AS BIGINT) AS shard, pack_id, CAST(n_tokens AS BIGINT) AS n_tokens " +
      "FROM p ORDER BY doc_id"

  /** Mirror of Multimodal.decodeStub + resizeMeta over the documents
    * payload: header-byte dims, parity format, stride-4 rolling-digest
    * features (exact-integer fold, then ONE double division — bitwise
    * stable), and the aspect-preserving resize (no 0.5-boundary rounding
    * cases exist: dims are 16+8k <= 136, and c*64/long = x.5 would need
    * long >= 1024). Bytes via substr/ascii — valid on the ASCII corpus
    * (same caveat as frameSampleSql). */
  def decodeSql(maxDim: Int): String = {
    val feats = (0 until 4).map { j =>
      s"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(range(${j + 1}, length(text)+1, 4), " +
        s"i -> ord(substr(text, CAST(i AS BIGINT), 1)))), " +
        s"(acc, c) -> (acc*31 + c) % ${TextAnalysis.FpMod}) AS DOUBLE) " +
        s"/ ${TextAnalysis.FpMod}.0 AS f$j"
    }.mkString(", ")
    "WITH d AS (SELECT doc_id AS media_id, " +
      "16 + (ord(substr(text,1,1)) % 16) * 8 AS width, " +
      "16 + (ord(substr(text,2,1)) % 16) * 8 AS height, " +
      "CASE WHEN length(text) % 2 = 0 THEN 'png' ELSE 'jpg' END AS format, " +
      s"$feats FROM documents) " +
      "SELECT media_id, width, height, format, f0, f1, f2, f3, " +
      s"CAST(round(width * ($maxDim.0 / greatest(width, height))) AS INTEGER) AS out_width, " +
      s"CAST(round(height * ($maxDim.0 / greatest(width, height))) AS INTEGER) AS out_height " +
      "FROM d ORDER BY media_id"
  }

  /** Mirror of Multimodal.frameSampleStub over the documents payload:
    * every `stride`-th 8-byte window digested with the byte-level
    * rolling (acc*31 + byte) % FpMod fold, unrolled to 8 nested mods.
    * Byte access is via character substr/ascii, which equals byte access
    * because the corpus is pure ASCII (verified: octet_length = length
    * on every SF) — a non-ASCII corpus would need a BLOB byte accessor. */
  /** The frame-window CTE + digest expression shared by frameSampleSql
    * and frameNearDupSql (one definition — the two oracles cannot
    * drift). */
  private def frameCte(stride: Int): (String, String) = {
    val win = 8 * stride
    val digest = (0 until 8).foldLeft("0") { (acc, k) =>
      s"(($acc)*31 + ascii(substr(text, CAST(f*$win+$k+1 AS BIGINT), 1))) % ${TextAnalysis.FpMod}"
    }
    (s"fr AS (SELECT doc_id, text, " +
      s"unnest(range(0, CAST(length(text) // $win AS BIGINT))) AS f FROM documents)",
      digest)
  }

  def frameSampleSql(stride: Int): String = {
    val (cte, digest) = frameCte(stride)
    s"WITH $cte " +
      s"SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx, " +
      s"CAST($digest AS BIGINT) AS frame_digest FROM fr ORDER BY media_id, frame_idx"
  }

  /** Mirror of Multimodal.frameNearDup over the documents payload: the
    * SAME frame digests (frameCte), distinct per media, df-capped
    * stop-frame guard, shared-digest pair counts, containment one
    * division of two exact BIGINTs (no rounding discipline needed). */
  def frameNearDupSql(stride: Int, dfCap: Long, minShared: Long): String = {
    val (cte, digest) = frameCte(stride)
    s"WITH $cte, " +
      s"fd AS (SELECT DISTINCT doc_id AS media_id, CAST($digest AS BIGINT) AS frame_digest FROM fr), " +
      s"keep AS (SELECT frame_digest FROM fd GROUP BY 1 HAVING count(*) <= $dfCap), " +
      "capped AS (SELECT fd.media_id, fd.frame_digest FROM fd JOIN keep USING (frame_digest)), " +
      "sizes AS (SELECT media_id, CAST(count(*) AS BIGINT) AS nset FROM capped GROUP BY 1), " +
      "p AS (SELECT a.media_id AS ma, b.media_id AS mb, CAST(count(*) AS BIGINT) AS n_shared " +
      "FROM capped a JOIN capped b ON a.frame_digest = b.frame_digest AND a.media_id < b.media_id " +
      s"GROUP BY 1, 2 HAVING count(*) >= $minShared) " +
      "SELECT ma, mb, n_shared, " +
      "CAST(n_shared AS DOUBLE) / CAST(least(sa.nset, sb.nset) AS DOUBLE) AS containment " +
      "FROM p JOIN sizes sa ON sa.media_id = p.ma JOIN sizes sb ON sb.media_id = p.mb " +
      "ORDER BY ma, mb"
  }

  /** Mirror of Multimodal.phashPairs over the documents payload: the
    * SAME frame digests (frameCte) fold into the wide SimHash's 60-bit
    * affine majority vote (identical (a, c) constants from the Scala
    * formulas — all-integer, bit-for-bit), then the 4×15-bit chunk
    * banding and exact hamming filter of simhashPairsWideSql. Media
    * with zero frames emit no signature on either side. */
  def phashPairsSql(stride: Int, maxHamming: Int): String = {
    import graft.llm.TextAnalysis.FpMod
    val (cte, digest) = frameCte(stride)
    val terms = (0 until Dedup.SimhashWideBits).map { b =>
      s"CASE WHEN 2*len(list_filter(hv, h -> 2*((h*${Dedup.wideA(b)} + ${Dedup.wideC(b)}) % $FpMod) >= $FpMod)) >= len(hv) " +
        s"THEN CAST(${1L << b} AS BIGINT) ELSE 0 END"
    }.mkString(" + ")
    val mask = (1L << Dedup.SimhashWideChunkBits) - 1
    val bandVals = (0 until Dedup.SimhashWideChunks).map(c => s"($c)").mkString(", ")
    s"WITH $cte, " +
      s"ph AS (SELECT doc_id AS media_id, CAST($digest AS BIGINT) AS hd FROM fr), " +
      "hs AS (SELECT media_id, list(hd) AS hv FROM ph GROUP BY media_id), " +
      s"sig AS (SELECT media_id, $terms AS phash FROM hs), " +
      s"bands AS (SELECT media_id, phash, chunk, " +
      s"(phash >> (chunk*${Dedup.SimhashWideChunkBits})) & $mask AS key " +
      s"FROM sig, (VALUES $bandVals) ch(chunk)), " +
      "cand AS (SELECT DISTINCT a.media_id AS ma, b.media_id AS mb, " +
      "a.phash AS sa, b.phash AS sb FROM bands a JOIN bands b " +
      "ON a.chunk = b.chunk AND a.key = b.key AND a.media_id < b.media_id) " +
      "SELECT ma, mb, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming " +
      s"FROM cand WHERE bit_count(xor(sa, sb)) <= $maxHamming ORDER BY ma, mb"
  }

  /** Mirror of Multimodal.incrementalFrameNearDup on the contract split
    * (batch = doc_id % batchMod == 0): on a split of one table the
    * union-wide stop-frame cap equals the global cap, and the pairs are
    * the batch×corpus digest collisions. */
  def incrFrameNearDupSql(stride: Int, dfCap: Long, minShared: Long,
                          batchMod: Int): String = {
    val (cte, digest) = frameCte(stride)
    s"WITH $cte, " +
      s"fd AS (SELECT DISTINCT doc_id AS media_id, CAST($digest AS BIGINT) AS frame_digest FROM fr), " +
      s"keep AS (SELECT frame_digest FROM fd GROUP BY 1 HAVING count(*) <= $dfCap), " +
      "capped AS (SELECT fd.media_id, fd.frame_digest FROM fd JOIN keep USING (frame_digest)), " +
      "sizes AS (SELECT media_id, CAST(count(*) AS BIGINT) AS nset FROM capped GROUP BY 1), " +
      "p AS (SELECT a.media_id AS batch_id, b.media_id AS corpus_id, CAST(count(*) AS BIGINT) AS n_shared " +
      "FROM capped a JOIN capped b ON a.frame_digest = b.frame_digest " +
      s"AND a.media_id % $batchMod = 0 AND b.media_id % $batchMod <> 0 " +
      s"GROUP BY 1, 2 HAVING count(*) >= $minShared) " +
      "SELECT batch_id, corpus_id, n_shared, " +
      "CAST(n_shared AS DOUBLE) / CAST(least(sa.nset, sb.nset) AS DOUBLE) AS containment " +
      "FROM p JOIN sizes sa ON sa.media_id = p.batch_id JOIN sizes sb ON sb.media_id = p.corpus_id " +
      "ORDER BY batch_id, corpus_id"
  }

  /** Mirror of Dedup.decontaminate with benchmark = documents whose
    * doc_id % `benchMod` = 0: drop every document sharing a word
    * `n`-gram STRING with any benchmark document (string match on both
    * sides — no hash in the key, so no collision-dependence). */
  def decontaminateSql(n: Int, benchMod: Int): String = {
    val gram = (0 until n).map(o => s"toks[(i+$o)::INT]").mkString(" || ' ' || ")
    s"WITH t AS ($toksCte), " +
      s"g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= $n THEN " +
      s"list_distinct(list_transform(range(1, len(toks)-${n - 1}+1), i -> $gram)) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS s FROM t), " +
      s"bench AS (SELECT DISTINCT s FROM g WHERE doc_id % $benchMod = 0), " +
      "bad AS (SELECT DISTINCT doc_id FROM g JOIN bench USING (s)) " +
      "SELECT d.doc_id, d.lang FROM documents d " +
      "WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id) " +
      "ORDER BY d.doc_id"
  }

  /** Mirror of TextAnalysis.repetition: word/bigram occurrence counts,
    * duplicate and top-word fractions rounded to 4 decimals. */
  val repetitionSql: String =
    s"WITH t AS ($toksCte), " +
      "w AS (SELECT doc_id, unnest(toks) AS w FROM t), " +
      "wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2), " +
      "ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, " +
      "count(*) AS n_distinct, max(c) AS top_cnt FROM wc GROUP BY 1), " +
      "b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN " +
      "list_transform(range(1, len(toks)), i -> toks[i::INT] || ' ' || toks[(i+1)::INT]) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS bg FROM t), " +
      "bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2), " +
      "bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi, " +
      "count(*) AS n_bi_distinct FROM bc GROUP BY 1) " +
      "SELECT ws.doc_id, n_tokens, " +
      "round(1.0 - n_distinct/n_tokens, 4) AS dup_word_frac, " +
      "round(top_cnt/n_tokens, 4) AS top_word_frac, " +
      "coalesce(round(1.0 - n_bi_distinct/n_bi, 4), 0.0) AS dup_bigram_frac " +
      "FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id ORDER BY ws.doc_id"

  /** Mirror of TextAnalysis.stratifiedSample: per-language top-k by
    * (content polyhash, doc_id). */
  def stratifiedSampleSql(perGroup: Int): String =
    "WITH f AS (SELECT lang, doc_id, " +
      s"(CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END) AS h FROM documents), " +
      "r AS (SELECT lang, doc_id, " +
      "row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM f) " +
      s"SELECT lang, doc_id, rn FROM r WHERE rn <= $perGroup ORDER BY lang, doc_id"

  /** Mirror of TextAnalysis.novelty: same distinct-shingle explode, df
    * aggregate, and per-doc unique-fraction; integer counts + one
    * rounded non-negative division — bitwise by construction. */
  def noveltySql: String =
    s"WITH $shingleCtes, " +
      "dfq AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY s), " +
      "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles, " +
      "CAST(count(*) FILTER (WHERE df = 1) AS BIGINT) AS n_unique " +
      "FROM ex JOIN dfq USING (s) GROUP BY doc_id) " +
      "SELECT d0.doc_id, coalesce(n_shingles, 0) AS n_shingles, " +
      "coalesce(n_unique, 0) AS n_unique, " +
      "round(CAST(n_unique AS DOUBLE) / n_shingles, 4) AS novelty " +
      "FROM documents d0 LEFT JOIN per ON d0.doc_id = per.doc_id " +
      "ORDER BY d0.doc_id"

  /** End-to-end composition mirror: chunk-level dedup → reassembled
    * texts (docs emptied by dedup dropped) → token-budget mixture over
    * the CLEANED corpus, reported per source. Reuses the chunk CTE and
    * keeper/reassembly logic verbatim and re-derives the budget window
    * over the cleaned text — the oracle proves three operators compose
    * into one deterministic result, same as the Spark side chains the
    * library calls. */
  def curateChunksSql(k: Int, budget: Long): String =
    s"WITH ${chunkCtes(k)}, $dedupKeptCtes, " +
      "cleaned AS (SELECT d0.doc_id, d0.source, re.text " +
      "FROM documents d0 JOIN re ON d0.doc_id = re.doc_id WHERE re.n_kept > 0), " +
      "tb AS (SELECT doc_id, source, " +
      "CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks, " +
      s"coalesce(CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END, 0) AS fp " +
      "FROM cleaned), " +
      "c AS (SELECT doc_id, source, n_toks, " +
      "sum(n_toks) OVER (PARTITION BY source ORDER BY fp, doc_id " +
      "ROWS UNBOUNDED PRECEDING) AS cum FROM tb) " +
      "SELECT source, count(*) AS n_docs, " +
      s"count(*) FILTER (WHERE cum <= $budget) AS n_kept, " +
      s"CAST(coalesce(sum(n_toks) FILTER (WHERE cum <= $budget), 0) AS BIGINT) AS tok_kept " +
      "FROM c GROUP BY source ORDER BY source"

  /** Mirror of TextAnalysis.tokenBudgetSample (uniform budget) +
    * per-source report: same fingerprint draw order, same running-sum
    * prefix rule (ROWS UNBOUNDED PRECEDING ≡ Spark's rowsBetween), all
    * integer arithmetic; sums cast back to BIGINT (DuckDB widens to
    * HUGEINT, which pandas would surface as float64). */
  /** Shared draw-order + running-sum CTEs of the token-budget mirrors. */
  private val tokenBudgetCtes: String =
    "t AS (SELECT doc_id, source, " +
      "CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks, " +
      s"coalesce(CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END, 0) AS fp " +
      "FROM documents), " +
      "c AS (SELECT doc_id, source, n_toks, " +
      "sum(n_toks) OVER (PARTITION BY source ORDER BY fp, doc_id " +
      "ROWS UNBOUNDED PRECEDING) AS cum FROM t)"

  def tokenBudgetSql(budget: Long): String =
    s"WITH $tokenBudgetCtes " +
      "SELECT source, count(*) AS n_docs, " +
      s"count(*) FILTER (WHERE cum <= $budget) AS n_kept, " +
      "CAST(sum(n_toks) AS BIGINT) AS tok_total, " +
      s"CAST(coalesce(sum(n_toks) FILTER (WHERE cum <= $budget), 0) AS BIGINT) AS tok_kept, " +
      s"min(doc_id) FILTER (WHERE cum <= $budget) AS first_kept " +
      "FROM c GROUP BY source ORDER BY source"

  /** Mirror of the q_temperature_sample report: per-source token sums,
    * thresholds floor(sqrt(min/toks)·FpMod) — double division and sqrt
    * are IEEE-correctly-rounded in both engines on identical inputs,
    * and floor has no half-boundary ambiguity (unlike round) — then
    * the content-hash coin applied per row. */
  def temperatureSampleSql: String =
    "WITH t AS (SELECT doc_id, source, " +
      "CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks, " +
      s"coalesce(CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END, 0) AS fp " +
      "FROM documents), " +
      "ps AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS toks FROM t GROUP BY source), " +
      "m AS (SELECT min(toks) AS mt FROM ps), " +
      "th AS (SELECT source, CAST(floor(sqrt(CAST(mt AS DOUBLE) / CAST(toks AS DOUBLE)) " +
      s"* ${TextAnalysis.FpMod}.0) AS BIGINT) AS thresh FROM ps CROSS JOIN m) " +
      "SELECT t.source, count(*) AS n_docs, " +
      "count(*) FILTER (WHERE fp < thresh) AS n_kept, " +
      "CAST(coalesce(sum(n_toks) FILTER (WHERE fp < thresh), 0) AS BIGINT) AS tok_kept " +
      "FROM t JOIN th ON t.source = th.source " +
      "GROUP BY t.source ORDER BY t.source"

  /** Mirror of the kept-only report over tokenBudgetSampleTrimmed: the
    * pre-trim discards only rows provably past budget, so the kept set
    * equals the exact operator's — the oracle therefore re-derives it
    * from the SAME exact window as tokenBudgetSql, restricted to kept
    * rows. Sources with no kept document drop out on both sides (WHERE
    * before GROUP BY, not FILTER). */
  def tokenBudgetTrimSql(budget: Long): String =
    s"WITH $tokenBudgetCtes " +
      "SELECT source, count(*) AS n_kept, " +
      "CAST(sum(n_toks) AS BIGINT) AS tok_kept, " +
      "min(doc_id) AS first_kept " +
      s"FROM c WHERE cum <= $budget GROUP BY source ORDER BY source"

  // ---------- similarity search ----------

  private val cosSql =
    "list_dot_product(qv, v)/(sqrt(list_dot_product(qv, qv))*sqrt(list_dot_product(v, v)))"

  /** Squared L2 distance between two DOUBLE[] expressions — mirrors the
    * Spark side's distSq. Ranking by list_distance (a sqrt) would admit a
    * divergence class: sqrt is non-injective over doubles, so two cells
    * with distinct d2 can collide post-sqrt and fall to the cell_id
    * tie-break in ONE engine only. Squared distances keep both engines
    * ordering the same quantity. */
  private def l2sqSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> ($a[i::INT] - $b[i::INT])*($a[i::INT] - $b[i::INT])))"

  def annTopKSql(queryIds: Seq[Long], k: Int): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      s"scored AS (SELECT query_id, e.vec_id AS neighbor_id, $cosSql AS sim " +
      "FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM scored) " +
      s"SELECT query_id, neighbor_id, round(sim, 4) AS sim FROM r WHERE rn <= $k " +
      "ORDER BY query_id, neighbor_id"

  /** Packed sign-signature list of a DOUBLE[] `v` — mirror of
    * graft.functions.BitOps.signBits: word `w` (0-based) holds bits for
    * positions 32w..32w+31, bit j set iff the coordinate is strictly
    * > 0. Each word is a sum of DISTINCT powers of two below 2^32 —
    * exact BIGINT arithmetic, no sign-bit overflow, so both engines
    * assemble identical words by construction (float > 0 is invariant
    * under the float→double cast both engines share). The isnan guard
    * pins the one comparison the engines DON'T share: DuckDB orders
    * NaN greater than everything (NaN > 0 is TRUE) while Java's
    * primitive compare returns false — the sf corpora carry no NaN
    * today, but a regeneration must not flip oracle bits. */
  private val sigSql: String =
    "list_transform(range(0, (len(v)+31)//32), " +
      "w -> CAST(list_sum(list_transform(range(32*w+1, least(32*w+32, len(v))+1), " +
      "i -> CASE WHEN v[i::INT] > 0 AND NOT isnan(v[i::INT]) " +
      "THEN (1::BIGINT << CAST((i-1) % 32 AS INT)) " +
      "ELSE 0::BIGINT END)) AS BIGINT))"

  /** XOR-popcount Hamming distance between two signature lists — mirror
    * of BitOps.hamming (DuckDB's bit_count on BIGINT is the two's-
    * complement popcount, identical to Java's Long.bitCount). */
  private def hammingDistSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($b)+1), " +
      s"w -> bit_count(xor($a[w::INT], $b[w::INT])))) AS BIGINT)"

  /** Mirror of Similarity.hammingTopK / hammingProbe: sign signatures,
    * XOR-popcount distance, per-query (hamming, neighbor_id) window —
    * every column an exact integer, zero float discipline. `excludeIds`
    * mirrors a deletion-vector probe over a persisted signature store:
    * forgotten ids leave the corpus before signatures derive. */
  def hammingSql(queryIds: Seq[Long], k: Int,
                 excludeIds: Seq[Long] = Nil): String = {
    val excl =
      if (excludeIds.isEmpty) ""
      else s" WHERE vec_id NOT IN (${excludeIds.mkString(", ")})"
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
      s"FROM embeddings$excl), " +
      s"s AS (SELECT vec_id, $sigSql AS sig FROM e), " +
      "q AS (SELECT vec_id AS query_id, sig AS qsig FROM s " +
      s"WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      "scored AS (SELECT query_id, s.vec_id AS neighbor_id, " +
      s"${hammingDistSql("qsig", "sig")} AS hamming " +
      "FROM s CROSS JOIN q WHERE s.vec_id <> q.query_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY hamming, neighbor_id) AS rn FROM scored) " +
      s"SELECT query_id, neighbor_id, hamming, rn FROM r WHERE rn <= $k " +
      "ORDER BY query_id, neighbor_id"
  }

  /** Mirror of Similarity.hammingRefined — the binary propose → exact
    * refine composition: the hammingSql candidate set at k = proposeR
    * (nested whole, the ivfPqRefinedSql pattern) re-scored by the same
    * l2sqSql kernel both engines already cross bitwise; ranking on the
    * UNROUNDED distance, only the output rounds. `excludeIds` filters
    * the refine-stage e/q CTEs too, not just the nested propose stage:
    * the stored path (hammingRefinedStored) resolves query vectors and
    * rerank fetches from the vec store's liveView, where a forgotten id
    * is gone EVERYWHERE — the mirror must match those semantics by
    * construction, not by relying on AnnQueryIds staying disjoint from
    * the forget set (r18 advisor). */
  def hammingRefinedSql(queryIds: Seq[Long], proposeR: Int, k: Int,
                        excludeIds: Seq[Long] = Nil): String = {
    val excl =
      if (excludeIds.isEmpty) ""
      else s" WHERE vec_id NOT IN (${excludeIds.mkString(", ")})"
    s"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings$excl), " +
      s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      "cand AS (SELECT query_id, neighbor_id FROM " +
      s"(${hammingSql(queryIds, proposeR, excludeIds)}) c), " +
      "rf AS (SELECT cand.query_id, cand.neighbor_id, " +
      s"${l2sqSql("q.qv", "e.v")} AS d2raw " +
      "FROM cand JOIN e ON e.vec_id = cand.neighbor_id " +
      "JOIN q ON q.query_id = cand.query_id), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY d2raw, neighbor_id) AS rn FROM rf) " +
      s"SELECT query_id, neighbor_id, round(d2raw, 4) AS d2, " +
      "CAST(rn AS BIGINT) AS rn FROM rk " +
      s"WHERE rn <= $k ORDER BY query_id, rn"
  }

  /** Mirror of Similarity.hammingRecall: exact cosine top-k pool (the
    * annTopKSql window, unrounded) left-joined with the Hamming top-k,
    * grouped per query; counts exact BIGINTs, recall one CAST-to-DOUBLE
    * division (the rrfFuse discipline — bitwise, no rounding). */
  def hammingRecallSql(queryIds: Seq[Long], k: Int): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"s AS (SELECT vec_id, $sigSql AS sig FROM e), " +
      "hq AS (SELECT vec_id AS query_id, sig AS qsig FROM s " +
      s"WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      "hs AS (SELECT query_id, s.vec_id AS neighbor_id, " +
      s"${hammingDistSql("qsig", "sig")} AS hamming " +
      "FROM s CROSS JOIN hq WHERE s.vec_id <> hq.query_id), " +
      "hr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY hamming, neighbor_id) AS rn FROM hs), " +
      "cq AS (SELECT vec_id AS query_id, v AS qv FROM e " +
      s"WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      s"cs AS (SELECT query_id, e.vec_id AS neighbor_id, $cosSql AS sim " +
      "FROM e CROSS JOIN cq WHERE e.vec_id <> cq.query_id), " +
      "cr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY sim DESC, neighbor_id) AS rn FROM cs) " +
      "SELECT query_id, n_exact, n_found, " +
      "CAST(n_found AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall FROM (" +
      "SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact, " +
      "CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_found " +
      s"FROM (SELECT query_id, neighbor_id FROM cr WHERE rn <= $k) ex " +
      "LEFT JOIN (SELECT query_id, neighbor_id, 1 AS hit FROM hr " +
      s"WHERE rn <= $k) ap USING (query_id, neighbor_id) " +
      "GROUP BY query_id) ORDER BY query_id"

  /** Mirror of Similarity.retrievalEval over the exact-cosine ranking
    * graded by label-derived qrels: the annTopKSql window (unrounded)
    * is the ranked frame, relevance = same label as the query, and the
    * metrics follow the exact-grid discipline — every P@r carried as
    * the BIGINT h·(lcm(1..k)/r), AP/precision/RR each ONE division of
    * CAST-to-DOUBLE exact integers, no-relevant queries 0.0 never NaN. */
  def retrievalEvalSql(queryIds: Seq[Long], k: Int): String = {
    val lcm = graft.llm.Similarity.lcmTo(k)
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings), " +
      "q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel FROM e " +
      s"WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      s"scored AS (SELECT query_id, e.vec_id AS neighbor_id, $cosSql AS sim " +
      "FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), " +
      "rked AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER (" +
      "PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM scored), " +
      "rel AS (SELECT DISTINCT q.query_id, e.vec_id AS doc_id FROM e " +
      "JOIN q ON e.label = q.qlabel AND e.vec_id <> q.query_id), " +
      "j AS (SELECT r.query_id, r.rn, " +
      "CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit " +
      s"FROM (SELECT * FROM rked WHERE rn <= $k) r " +
      "LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.neighbor_id), " +
      "c AS (SELECT *, sum(hit) OVER (PARTITION BY query_id ORDER BY rn) AS hits_so_far FROM j), " +
      "per AS (SELECT query_id, CAST(sum(hit) AS BIGINT) AS n_rel, " +
      "min(CASE WHEN hit = 1 THEN rn END) AS frr, " +
      s"CAST(sum(CASE WHEN hit = 1 THEN hits_so_far * ($lcm // rn) ELSE 0 END) AS BIGINT) AS apnum " +
      "FROM c GROUP BY query_id), " +
      "rt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS r_total FROM rel GROUP BY query_id) " +
      "SELECT per.query_id, n_rel, " +
      s"CAST(n_rel AS DOUBLE) / CAST($k AS DOUBLE) AS prec, " +
      "CASE WHEN frr IS NULL THEN 0.0 ELSE CAST(1 AS DOUBLE) / CAST(frr AS DOUBLE) END AS rr, " +
      "CASE WHEN coalesce(r_total, 0) = 0 THEN 0.0 ELSE " +
      s"CAST(apnum AS DOUBLE) / CAST($lcm * least(r_total, $k) AS DOUBLE) END AS ap " +
      "FROM per LEFT JOIN rt ON rt.query_id = per.query_id ORDER BY per.query_id"
  }

  /** One arm of [[evalCompareSql]]: retrievalEval's metric fold over an
    * ARBITRARY ranked subquery (any SELECT yielding query_id,
    * neighbor_id, rn — nested whole, the mmrIndexedSql pattern), tagged
    * with its method name. Same label-qrels and exact-grid arithmetic
    * as retrievalEvalSql. */
  /** `memberPred`/`excludeIds` restrict the JUDGMENT corpus — the
    * served/as-of eval rows grade against the qrels of the surviving
    * (or snapshot) membership: a forgotten id leaves the judged set,
    * and a doc not yet ingested at the as-of batch was never in it. */
  private def retrievalEvalOverSql(rankedSql: String, method: String,
                                   queryIds: Seq[Long], k: Int,
                                   memberPred: Option[String] = None,
                                   excludeIds: Seq[Long] = Nil): String = {
    val lcm = graft.llm.Similarity.lcmTo(k)
    val preds = memberPred.toSeq ++
      (if (excludeIds.isEmpty) Nil
       else Seq(s"vec_id NOT IN (${excludeIds.mkString(", ")})"))
    val where = if (preds.isEmpty) "" else preds.mkString(" WHERE ", " AND ", "")
    s"WITH e AS (SELECT vec_id, label FROM embeddings$where), " +
      "q AS (SELECT vec_id AS query_id, label AS qlabel FROM e " +
      s"WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      "rel AS (SELECT DISTINCT q.query_id, e.vec_id AS doc_id FROM e " +
      "JOIN q ON e.label = q.qlabel AND e.vec_id <> q.query_id), " +
      s"rked AS (SELECT query_id, neighbor_id, rn FROM ($rankedSql) xr " +
      s"WHERE rn <= $k), " +
      "j AS (SELECT r.query_id, r.rn, " +
      "CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit " +
      "FROM rked r " +
      "LEFT JOIN rel ON rel.query_id = r.query_id AND rel.doc_id = r.neighbor_id), " +
      "c AS (SELECT *, sum(hit) OVER (PARTITION BY query_id ORDER BY rn) AS hits_so_far FROM j), " +
      "per AS (SELECT query_id, CAST(sum(hit) AS BIGINT) AS n_rel, " +
      "min(CASE WHEN hit = 1 THEN rn END) AS frr, " +
      s"CAST(sum(CASE WHEN hit = 1 THEN hits_so_far * ($lcm // rn) ELSE 0 END) AS BIGINT) AS apnum " +
      "FROM c GROUP BY query_id), " +
      "rt AS (SELECT query_id, CAST(count(*) AS BIGINT) AS r_total FROM rel GROUP BY query_id) " +
      s"SELECT '$method' AS method, per.query_id, n_rel, " +
      s"CAST(n_rel AS DOUBLE) / CAST($k AS DOUBLE) AS prec, " +
      "CASE WHEN frr IS NULL THEN 0.0 ELSE CAST(1 AS DOUBLE) / CAST(frr AS DOUBLE) END AS rr, " +
      "CASE WHEN coalesce(r_total, 0) = 0 THEN 0.0 ELSE " +
      s"CAST(apnum AS DOUBLE) / CAST($lcm * least(r_total, $k) AS DOUBLE) END AS ap " +
      "FROM per LEFT JOIN rt ON rt.query_id = per.query_id"
  }

  /** Mirror of the retriever COMPARISON row: the exact-cosine ranking,
    * the raw Hamming ranking, and the Hamming-propose/exact-refine
    * ranking each graded by the same label qrels on the same exact
    * grid — three nested ranked subqueries (each already a proven
    * contract mirror) through one metric fold. The exact arm's ranked
    * frame is the annTopKSql window; the refined arm ranks by exact
    * L2², so its metrics quantify what the refine budget buys in AP
    * terms, hash-checked. */
  def evalCompareSql(queryIds: Seq[Long], k: Int, proposeR: Int,
                     coarseIds: Seq[Long], codebookIds: Seq[Long],
                     m: Int, nprobe: Int): String = {
    val exactRanked = exactRankedSql(queryIds, None)
    val arms = Seq(
      retrievalEvalOverSql(exactRanked, "exact", queryIds, k),
      retrievalEvalOverSql(hammingSql(queryIds, k), "hamming", queryIds, k),
      retrievalEvalOverSql(hammingRefinedSql(queryIds, proposeR, k),
        "hamming_refined", queryIds, k),
      retrievalEvalOverSql(
        ivfPqSearchSql(coarseIds, codebookIds, m, queryIds, nprobe, k),
        "ivf_pq", queryIds, k))
    arms.map(a => s"SELECT * FROM ($a)").mkString("", " UNION ALL ", " ") +
      "ORDER BY method, query_id"
  }

  /** Exact-cosine ranked frame (query_id, neighbor_id, rn), optionally
    * restricted to a corpus-membership predicate — the as-of/served
    * arms rank over a snapshot or surviving membership. v (from e2)
    * and qv (from q2) are unambiguous in this join, so the shared
    * cosine kernel string applies verbatim. */
  private def exactRankedSql(queryIds: Seq[Long],
                             memberPred: Option[String]): String = {
    val mp = memberPred.map(p => s" WHERE $p").getOrElse("")
    s"WITH e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings$mp), " +
      "q2 AS (SELECT vec_id AS query_id, v AS qv FROM e2 " +
      s"WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      s"s2 AS (SELECT query_id, e2.vec_id AS neighbor_id, $cosSql AS sim " +
      "FROM e2 CROSS JOIN q2 WHERE e2.vec_id <> q2.query_id) " +
      "SELECT query_id, neighbor_id, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY sim DESC, neighbor_id) AS rn FROM s2"
  }

  /** Mirror of the SERVED-store eval row: the three production serving
    * rankings — binary propose/exact refine (sig + vec stores), IVF-PQ
    * propose/exact refine (index + vec stores), and the LEXICAL store's
    * multi-probe (postings + stats_agg), ALL with the same forget set
    * marked — graded through the same metric fold, with the JUDGMENT
    * corpus also restricted to the survivors (`excludeIds` leaves qrels
    * too: forgetting an id changes what is judged, which is the
    * attestation story's point; for the lexical arm it ALSO shifts the
    * BM25 corpus constants, the deletion-vector probe semantics). Each
    * ranked arm is its already-proven contract mirror nested whole. */
  def evalServedSql(queryIds: Seq[Long], k: Int, proposeR: Int,
                    coarseIds: Seq[Long], codebookIds: Seq[Long],
                    m: Int, nprobe: Int, rerankR: Int,
                    lexQueries: Seq[(Long, Seq[String])],
                    k1: Double, b: Double,
                    excludeIds: Seq[Long]): String = {
    val lexRanked = "SELECT query_id, doc_id AS neighbor_id, rn FROM " +
      s"(${bm25MultiSql(lexQueries, k, k1, b, excludeIds)}) lxm"
    val arms = Seq(
      retrievalEvalOverSql(
        hammingRefinedSql(queryIds, proposeR, k, excludeIds),
        "hamming_served", queryIds, k, excludeIds = excludeIds),
      retrievalEvalOverSql(lexRanked,
        "lex_served", queryIds, k, excludeIds = excludeIds),
      retrievalEvalOverSql(
        ivfPqRefinedSql(coarseIds, codebookIds, m, queryIds, nprobe,
          rerankR, k, excludeNeighbors = excludeIds,
          excludeIds = excludeIds),
        "refine_served", queryIds, k, excludeIds = excludeIds))
    arms.map(a => s"SELECT * FROM ($a)").mkString("", " UNION ALL ", " ") +
      "ORDER BY method, query_id"
  }

  /** Mirror of the CROSS-MODALITY eval row: the proven lexical
    * multi-probe mirror ([[bm25MultiSql]]), the exact-cosine ranking,
    * and their RRF fusion (the [[hybridRrfSql]] join/score shape
    * generalized to the multi-query pools: integer rank adds CAST to
    * DOUBLE, lex term + sem term in written order, ties to the lowest
    * neighbor id) — each nested whole through the same metric fold.
    * doc_id ≡ vec_id in this corpus, so one label-qrels table judges
    * all three modalities. */
  def evalHybridSql(queries: Seq[(Long, Seq[String])], k: Int, kRrf: Int,
                    k1: Double, b: Double): String = {
    val queryIds = queries.map(_._1)
    val lexRanked =
      s"SELECT query_id, doc_id AS neighbor_id, rn FROM (${bm25MultiSql(queries, k, k1, b)}) lx"
    val semRanked =
      s"SELECT * FROM (${exactRankedSql(queryIds, None)}) sx WHERE rn <= $k"
    val fusedRanked =
      s"WITH lex AS ($lexRanked), sem AS ($semRanked), " +
        "f AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id, " +
        "coalesce(lex.neighbor_id, sem.neighbor_id) AS neighbor_id, " +
        s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + lex.rn AS DOUBLE), CAST(0 AS DOUBLE)) + " +
        s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + sem.rn AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf " +
        "FROM lex FULL OUTER JOIN sem ON lex.query_id = sem.query_id " +
        "AND lex.neighbor_id = sem.neighbor_id), " +
        "rk AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER " +
        "(PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn FROM f) " +
        s"SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn FROM rk WHERE rn <= $k"
    val arms = Seq(
      retrievalEvalOverSql(lexRanked, "lexical", queryIds, k),
      retrievalEvalOverSql(semRanked, "semantic", queryIds, k),
      retrievalEvalOverSql(fusedRanked, "rrf_fused", queryIds, k))
    arms.map(a => s"SELECT * FROM ($a)").mkString("", " UNION ALL ", " ") +
      "ORDER BY method, query_id"
  }

  /** Mirror of the TIME-TRAVEL eval row: the same exact-cosine
    * retriever graded against the corpus AS OF two different ingest
    * batches (membership = the `vec_id % nBatches <= b` ingest split) —
    * ranking, query resolution, AND judgment table all restricted to
    * each snapshot: a query vector not yet ingested at batch b simply
    * has no row, and later batches never move an earlier snapshot's
    * metrics (the reproducible-eval primitive, spec-pinned). */
  def evalAsOfSql(queryIds: Seq[Long], k: Int, nBatches: Int,
                  asOfBatches: Seq[Long]): String = {
    val arms = asOfBatches.map { b =>
      val pred = s"vec_id % $nBatches <= $b"
      retrievalEvalOverSql(exactRankedSql(queryIds, Some(pred)),
        s"asof_b$b", queryIds, k, memberPred = Some(pred))
    }
    arms.map(a => s"SELECT * FROM ($a)").mkString("", " UNION ALL ", " ") +
      "ORDER BY method, query_id"
  }

  /** Mirror of Similarity.hardNegatives: the annTopKSql shape with the
    * label-inequality predicate on the query join; `sim` crosses
    * UNROUNDED (the mmrSql discipline — the cosine kernel is mirrored
    * exactly, the (sim DESC, neighbor_id) order is total). */
  def hardNegativesSql(queryIds: Seq[Long], k: Int): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings), " +
      "q AS (SELECT vec_id AS query_id, v AS qv, label AS qlabel FROM e " +
      s"WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      s"scored AS (SELECT query_id, e.vec_id AS neighbor_id, e.label, $cosSql AS sim " +
      "FROM e CROSS JOIN q WHERE e.label <> q.qlabel), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY sim DESC, neighbor_id) AS rn FROM scored) " +
      s"SELECT query_id, neighbor_id, label, sim, rn FROM r WHERE rn <= $k " +
      "ORDER BY query_id, neighbor_id"

  /** Mirror of Similarity.mmrRerank: the identical cosine pool (the
    * same unrounded (rel DESC, vec_id) window as annTopKSql), a
    * directed pairwise pool-cosine table (cosine is bitwise symmetric —
    * per-term products and the two norm factors commute — so it equals
    * the Spark side's one stored triangle by value), and the greedy
    * selection unrolled to k LIMIT-1 CTEs (the vkmeansIterateSql
    * pattern): each step scores the unselected pool by
    * `λ·rel − (1−λ)·max(sim to selected)` with the same interpolated
    * literals in the same written order (ms = 0.0 for the first pick)
    * and takes (score DESC, vec_id) — a bitwise-total order, so both
    * relevance and mmr_score cross UNROUNDED. */
  def mmrSql(queryId: Long, poolN: Int, k: Int, lambda: Double): String = {
    require(poolN >= k && k >= 1, s"need poolN >= k >= 1, got poolN=$poolN k=$k")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"q AS (SELECT v AS qv FROM e WHERE vec_id = $queryId), " +
      s"scored AS (SELECT e.vec_id, e.v, $cosSql AS rel " +
      s"FROM e CROSS JOIN q WHERE e.vec_id <> $queryId), " +
      "pr AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rel DESC, vec_id) AS rn FROM scored), " +
      s"pool AS MATERIALIZED (SELECT vec_id, v, rel FROM pr WHERE rn <= $poolN), " +
      mmrGreedyCtes(k, lambda)
  }

  /** Mirror of Similarity.mmrRerankIndexed — the propose→rerank→MMR
    * production composition: the pool CTE is the ivfPqSearchSql
    * candidate set at k = poolR (the proven ADC mirror, nested exactly
    * as ivfPqRefinedSql nests it) with each candidate's EXACT cosine as
    * relevance; the greedy chain is [[mmrGreedyCtes]] verbatim.
    * `excludeIds` mirrors a deletion-vector probe over the persisted
    * store (mmrRerankStored): forgotten ids drop from the candidate set
    * before ranking, surviving ADC scores and the rerank unchanged. */
  def mmrIndexedSql(coarseIds: Seq[Long], codebookIds: Seq[Long], m: Int,
                    queryId: Long, nprobe: Int, poolR: Int, k: Int,
                    lambda: Double,
                    excludeIds: Seq[Long] = Nil): String = {
    require(poolR >= k && k >= 1, s"need poolR >= k >= 1, got poolR=$poolR k=$k")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"q AS (SELECT v AS qv FROM e WHERE vec_id = $queryId), " +
      "cand AS (SELECT neighbor_id FROM " +
      s"(${ivfPqSearchSql(coarseIds, codebookIds, m, Seq(queryId), nprobe,
        poolR, excludeNeighbors = excludeIds)}) c), " +
      s"pool AS MATERIALIZED (SELECT e.vec_id, e.v AS v, $cosSql AS rel " +
      "FROM cand JOIN e ON e.vec_id = cand.neighbor_id CROSS JOIN q), " +
      mmrGreedyCtes(k, lambda)
  }

  /** Mirror of the q_mmr_hybrid composition — the full RAG pipeline in
    * one query: the hybridRrfSql fused top-`fusedK` (the proven
    * cross-modality mirror, nested whole) nominates the candidates
    * (query doc excluded — a retrieval context never returns the query
    * itself), the pool re-scores each nominee by EXACT cosine, and the
    * greedy chain de-crowds. */
  def mmrHybridSql(queryTerms: Seq[String], k1: Double, b: Double,
                   queryId: Long, poolK: Int, kRrf: Int, fusedK: Int,
                   k: Int, lambda: Double): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"q AS (SELECT v AS qv FROM e WHERE vec_id = $queryId), " +
      "cand AS (SELECT neighbor_id FROM " +
      s"(${hybridRrfSql(queryTerms, k1, b, queryId, poolK, kRrf, fusedK)}) h " +
      s"WHERE neighbor_id <> $queryId), " +
      s"pool AS MATERIALIZED (SELECT e.vec_id, e.v AS v, $cosSql AS rel " +
      "FROM cand JOIN e ON e.vec_id = cand.neighbor_id CROSS JOIN q), " +
      mmrGreedyCtes(k, lambda)

  /** Mirror of the FULLY-SERVED MMR selection (q_rag_served): the
    * candidates come from the INDEXED hybrid fusion over the persisted
    * stores ([[hybridIndexedRrfSql]] — forgotten ids excluded from both
    * rankings, the deletion-vector liveViews), query doc excluded, the
    * pool re-scores each nominee by exact cosine, the greedy chain
    * de-crowds. Forgotten ids never reach the candidate set, so the
    * pool and the rerank-vector fetch are value-identical whether the
    * vectors come from the full table (here) or the store's liveView
    * (the Spark side). */
  def mmrHybridIndexedSql(queryTerms: Seq[String], k1: Double, b: Double,
                          queryId: Long, coarseIds: Seq[Long],
                          codebookIds: Seq[Long], m: Int, nprobe: Int,
                          poolK: Int, kRrf: Int, fusedK: Int, k: Int,
                          lambda: Double,
                          excludeIds: Seq[Long] = Nil): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"q AS (SELECT v AS qv FROM e WHERE vec_id = $queryId), " +
      "cand AS (SELECT neighbor_id FROM " +
      s"(${hybridIndexedRrfSql(queryTerms, k1, b, queryId, coarseIds,
        codebookIds, m, nprobe, poolK, kRrf, fusedK, excludeIds)}) h " +
      s"WHERE neighbor_id <> $queryId), " +
      s"pool AS MATERIALIZED (SELECT e.vec_id, e.v AS v, $cosSql AS rel " +
      "FROM cand JOIN e ON e.vec_id = cand.neighbor_id CROSS JOIN q), " +
      mmrGreedyCtes(k, lambda)

  /** The unrolled MMR greedy over a `pool`(vec_id, v, rel) CTE — shared
    * by [[mmrSql]] and [[mmrIndexedSql]]: a directed pairwise-cosine
    * table, then k LIMIT-1 selection CTEs (the vkmeansIterateSql
    * pattern), each scoring the unselected pool by
    * `λ·rel − (1−λ)·max(sim to selected)` with interpolated literals in
    * fixed written order and taking (score DESC, vec_id). */
  private def mmrGreedyCtes(k: Int, lambda: Double): String = {
    val mu = 1.0 - lambda
    val cosAb = "list_dot_product(a.v, b.v)/(sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v)))"
    val head =
      s"ps AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib, $cosAb AS sim " +
        "FROM pool a JOIN pool b ON a.vec_id <> b.vec_id), " +
        "acc1 AS (SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, rel, " +
        s"$lambda * rel - $mu * 0.0 AS mmr FROM pool " +
        s"ORDER BY $lambda * rel - $mu * 0.0 DESC, vec_id LIMIT 1)"
    val steps = (2 to k).map { t =>
      val prev = s"acc${t - 1}"
      s"cand$t AS (SELECT p.vec_id, p.rel, max(ps.sim) AS ms FROM pool p " +
        s"JOIN ps ON ps.ia = p.vec_id JOIN $prev s ON ps.ib = s.vec_id " +
        s"WHERE p.vec_id NOT IN (SELECT vec_id FROM $prev) GROUP BY p.vec_id, p.rel), " +
        s"sel$t AS (SELECT CAST($t AS BIGINT) AS sel_rank, vec_id, rel, " +
        s"$lambda * rel - $mu * ms AS mmr FROM cand$t " +
        s"ORDER BY $lambda * rel - $mu * ms DESC, vec_id LIMIT 1), " +
        s"acc$t AS (SELECT * FROM $prev UNION ALL SELECT * FROM sel$t)"
    }
    (head +: steps).mkString(", ") +
      s" SELECT sel_rank, vec_id AS neighbor_id, rel AS relevance, " +
      s"mmr AS mmr_score FROM acc$k ORDER BY sel_rank"
  }

  def dedupEmbeddingSql(coarseIds: Seq[Long], threshold: Double): String = {
    val cos = "list_dot_product(a.v, b.v)/(sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v)))"
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"coarse AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id IN (${coarseIds.mkString(", ")})), " +
      "ad AS (SELECT vec_id, v, cell_id, ROW_NUMBER() OVER (PARTITION BY vec_id " +
      s"ORDER BY ${l2sqSql("v", "cv")}, cell_id) AS rn FROM e CROSS JOIN coarse), " +
      "assigned AS (SELECT vec_id, v, cell_id FROM ad WHERE rn = 1) " +
      s"SELECT a.vec_id AS va, b.vec_id AS vb, round($cos, 4) AS sim " +
      "FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id " +
      s"WHERE $cos >= $threshold ORDER BY va, vb"
  }

  /** Mirror of Similarity.incrementalCosinePairs: batch = vec_id %
    * `batchMod` == 0, corpus = the rest; every vector assigns to its
    * nearest coarse cell (ties to lowest cell id — same argmin as
    * dedupEmbeddingSql, membership-independent), pairs are same-cell
    * batch×corpus only. Cosine is the identical IEEE expression, so
    * round(…, 4) lands on the same grid. */
  def incrementalSemSql(coarseIds: Seq[Long], threshold: Double, batchMod: Int): String = {
    val cos = "list_dot_product(a.v, b.v)/(sqrt(list_dot_product(a.v, a.v))*sqrt(list_dot_product(b.v, b.v)))"
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"coarse AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id IN (${coarseIds.mkString(", ")})), " +
      "ad AS (SELECT vec_id, v, cell_id, ROW_NUMBER() OVER (PARTITION BY vec_id " +
      s"ORDER BY ${l2sqSql("v", "cv")}, cell_id) AS rn FROM e CROSS JOIN coarse), " +
      "assigned AS (SELECT vec_id, v, cell_id FROM ad WHERE rn = 1) " +
      s"SELECT a.vec_id AS batch_id, b.vec_id AS corpus_id, round($cos, 4) AS sim " +
      "FROM assigned a JOIN assigned b ON a.cell_id = b.cell_id " +
      s"AND a.vec_id % $batchMod = 0 AND b.vec_id % $batchMod <> 0 " +
      s"WHERE $cos >= $threshold ORDER BY batch_id, corpus_id"
  }

  val eventsSessionizeSql: String =
    "WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events), " +
      "l AS (SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM ev), " +
      "s AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END) " +
      "OVER (PARTITION BY user_id ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM l) " +
      "SELECT user_id, session_id, count(*) AS n_events, min(tus) AS start_us, max(tus) AS end_us " +
      "FROM s GROUP BY 1, 2 ORDER BY 1, 2"

  /** Mirror of TextAnalysis.normalize: lower → collapse non-alnum runs
    * to one space → trim; digest + sizes. The character class is shared
    * Java-regex/RE2 semantics; DuckDB needs the explicit 'g' flag for
    * Spark's replace-all default. */
  val normalizeSql: String =
    "WITH n AS (SELECT doc_id, " +
      "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS t FROM documents) " +
      "SELECT doc_id, md5(t) AS norm_md5, CAST(length(t) AS BIGINT) AS n_norm_chars, " +
      "CAST(CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS BIGINT) AS n_norm_tokens " +
      "FROM n ORDER BY doc_id"

  /** Mirror of Dedup.dupStats: histogram of exact-duplicate group sizes. */
  val dupStatsSql: String =
    "SELECT group_size, count(*) AS n_groups, group_size * count(*) AS n_docs " +
      "FROM (SELECT CAST(count(*) AS BIGINT) AS group_size FROM documents GROUP BY text) " +
      "GROUP BY group_size ORDER BY group_size"

  /** Mirror of TextAnalysis.shuffleOrder: MINSTD key + shard, pure
    * BIGINT arithmetic (the fold keeps the multiply < 2^63). */
  def shuffleOrderSql(shards: Int): String = {
    val key = s"((doc_id % ${TextAnalysis.ShuffleFold}) * ${TextAnalysis.ShuffleMult}) " +
      s"% ${TextAnalysis.ShuffleMod}"
    s"SELECT doc_id, $key AS skey, CAST(($key) % $shards AS BIGINT) AS shard " +
      "FROM documents ORDER BY doc_id"
  }

  /** Mirror of Similarity.randomProject: the ±1 sign matrix is re-derived
    * from the same quadratic-mix formula (i, j 0-based in the formula,
    * 1-based in the output); products are exact (±float), so only the
    * summation order differs — round(4) absorbs it (gram-matrix margin). */
  def rpProjectSql(outDim: Int): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "a AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS i, unnest(v) AS x FROM e), " +
      s"js AS (SELECT CAST(range AS BIGINT) + 1 AS j FROM range($outDim)), " +
      "h AS (SELECT ii.i, js.j, ((ii.i-1)*7919 + (js.j-1)*104729 + 12345) % 10007 AS h1 " +
      "FROM (SELECT DISTINCT i FROM a) ii CROSS JOIN js), " +
      "sgn AS (SELECT i, j, CASE WHEN ((h1*h1 + h1) % 10007) % 2 = 0 " +
      "THEN 1.0 ELSE -1.0 END AS sg FROM h) " +
      "SELECT a.vec_id, g.j, " +
      s"round(sum(a.x * g.sg) / sqrt(CAST($outDim AS DOUBLE)), 4) AS y " +
      "FROM a JOIN sgn g ON a.i = g.i GROUP BY a.vec_id, g.j ORDER BY vec_id, j"

  /** Mirror of Similarity.pqEncode: codebook rows come from the
    * embeddings table by id with code = POSITION in `codebookIds` (the
    * same numbering as the inlined-literal argmin); dsub is derived from
    * the data (len(v)/m), so a dim change cannot silently truncate. Ties
    * break to the lowest code on both sides. */
  def pqEncodeSql(codebookIds: Seq[Long], m: Int): String = {
    val cbValues = codebookIds.zipWithIndex
      .map { case (id, c) => s"($c, $id)" }.mkString(", ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"cbm (code, cbid) AS (VALUES $cbValues), " +
      "cb AS (SELECT CAST(code AS BIGINT) AS code, v AS cv FROM cbm JOIN e ON e.vec_id = cbm.cbid), " +
      s"ss AS (SELECT CAST(range AS BIGINT) AS s FROM range($m)), " +
      s"sub AS (SELECT vec_id, s, list_slice(v, s*(len(v)//$m)+1, (s+1)*(len(v)//$m)) AS sv " +
      "FROM e CROSS JOIN ss), " +
      s"csub AS (SELECT code, s, list_slice(cv, s*(len(cv)//$m)+1, (s+1)*(len(cv)//$m)) AS cs " +
      "FROM cb CROSS JOIN ss), " +
      s"d AS (SELECT vec_id, s, code, ${l2sqSql("sv", "cs")} AS d2 " +
      "FROM sub JOIN csub USING (s)), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM d) " +
      "SELECT vec_id, s, code, round(d2, 4) AS err FROM r WHERE rn = 1 ORDER BY vec_id, s"
  }

  /** Mirror of Similarity.pqSearch: PQ codes via the same slice-argmin
    * as pqEncodeSql, per-query distance tables from the same slices,
    * ADC distance = sum of the m looked-up cells rounded to 4 BEFORE
    * ranking (the tfidf rounded-grid argument — both engines rank the
    * same quantity; ties to the lowest neighbor id). */
  def pqSearchSql(codebookIds: Seq[Long], m: Int, queryIds: Seq[Long], k: Int): String = {
    val cbValues = codebookIds.zipWithIndex
      .map { case (id, c) => s"($c, $id)" }.mkString(", ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"cbm (code, cbid) AS (VALUES $cbValues), " +
      "cb AS (SELECT CAST(code AS BIGINT) AS code, v AS cv FROM cbm JOIN e ON e.vec_id = cbm.cbid), " +
      s"ss AS (SELECT CAST(range AS BIGINT) AS s FROM range($m)), " +
      s"sub AS (SELECT vec_id, s, list_slice(v, s*(len(v)//$m)+1, (s+1)*(len(v)//$m)) AS sv " +
      "FROM e CROSS JOIN ss), " +
      s"csub AS (SELECT code, s, list_slice(cv, s*(len(cv)//$m)+1, (s+1)*(len(cv)//$m)) AS cs " +
      "FROM cb CROSS JOIN ss), " +
      s"d AS (SELECT vec_id, s, code, ${l2sqSql("sv", "cs")} AS d2 FROM sub JOIN csub USING (s)), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM d), " +
      "codes AS (SELECT vec_id, s, code FROM r WHERE rn = 1), " +
      s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      s"qsub AS (SELECT query_id, s, list_slice(qv, s*(len(qv)//$m)+1, (s+1)*(len(qv)//$m)) AS qs " +
      "FROM q CROSS JOIN ss), " +
      s"dt AS (SELECT query_id, s, code, ${l2sqSql("qs", "cs")} AS qd FROM qsub JOIN csub USING (s)), " +
      "ad AS (SELECT dt.query_id, c.vec_id AS neighbor_id, round(sum(dt.qd), 4) AS adist " +
      "FROM codes c JOIN dt ON c.s = dt.s AND c.code = dt.code " +
      "WHERE c.vec_id <> dt.query_id GROUP BY 1, 2), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn FROM ad) " +
      s"SELECT query_id, neighbor_id, adist, CAST(rn AS BIGINT) AS rn FROM rk WHERE rn <= $k " +
      "ORDER BY query_id, rn"
  }

  /** Mirror of Similarity.rrfFuse over the exact-cosine and PQ-ADC
    * rankings: both input rankings re-derived by their own contract
    * CTEs (the brute-force rank uses the UNROUNDED sim, exactly like
    * the operator), full-outer joined on (query, neighbor), each RRF
    * term one CAST-to-DOUBLE integer division, summed in fixed written
    * order — bitwise with no rounding. */
  def rrfFusionSql(codebookIds: Seq[Long], m: Int, queryIds: Seq[Long],
                   poolK: Int, kRrf: Int, topK: Int): String = {
    val bf =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
        s"scored AS (SELECT query_id, e.vec_id AS neighbor_id, $cosSql AS sim " +
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM scored) " +
        s"SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= $poolK"
    s"WITH bf AS (SELECT * FROM ($bf) b), " +
      s"pq AS (SELECT query_id, neighbor_id, rn FROM (${pqSearchSql(codebookIds, m, queryIds, poolK)}) p), " +
      "f AS (SELECT coalesce(bf.query_id, pq.query_id) AS query_id, " +
      "coalesce(bf.neighbor_id, pq.neighbor_id) AS neighbor_id, " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + bf.rn AS DOUBLE), CAST(0 AS DOUBLE)) + " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + pq.rn AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf " +
      "FROM bf FULL OUTER JOIN pq ON bf.query_id = pq.query_id AND bf.neighbor_id = pq.neighbor_id), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn2 FROM f) " +
      s"SELECT query_id, neighbor_id, rrf, CAST(rn2 AS BIGINT) AS rn FROM rk WHERE rn2 <= $topK " +
      "ORDER BY query_id, rn"
  }

  /** Mirror of the HYBRID lexical + semantic fusion: the bm25Sql ranking
    * (doc_id → neighbor_id, one synthetic query id) full-outer joined
    * with the exact-cosine ranking of the same query id, scored by the
    * two-term left-associated RRF sum — rrfFusionSql's join/score shape
    * with the lexical CTE standing in for the PQ side. Reads BOTH
    * tables (documents for BM25, embeddings for cosine). */
  def hybridRrfSql(queryTerms: Seq[String], k1: Double, b: Double,
                   queryId: Long, poolK: Int, kRrf: Int,
                   topK: Int): String = {
    val bf =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id = $queryId), " +
        s"scored AS (SELECT query_id, e.vec_id AS neighbor_id, $cosSql AS sim " +
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM scored) " +
        s"SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= $poolK"
    s"WITH lex AS (SELECT CAST($queryId AS BIGINT) AS query_id, " +
      s"doc_id AS neighbor_id, rn FROM (${bm25Sql(queryTerms, poolK, k1, b)}) l), " +
      s"sem AS (SELECT * FROM ($bf) s), " +
      "f AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id, " +
      "coalesce(lex.neighbor_id, sem.neighbor_id) AS neighbor_id, " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + lex.rn AS DOUBLE), CAST(0 AS DOUBLE)) + " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + sem.rn AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf " +
      "FROM lex FULL OUTER JOIN sem ON lex.query_id = sem.query_id AND lex.neighbor_id = sem.neighbor_id), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn2 FROM f) " +
      s"SELECT query_id, neighbor_id, rrf, CAST(rn2 AS BIGINT) AS rn FROM rk WHERE rn2 <= $topK " +
      "ORDER BY rn"
  }

  /** Mirror of TextAnalysis.ragChunks: start positions from
    * `range(0, len, stride)` (DuckDB's exclusive bound ≡ Spark's
    * inclusive `sequence(0, len-1, stride)` start set), chunk ids from
    * a ZIPPED same-SELECT unnest (the posexplode mirror), window text
    * via list_slice + array_to_string — all exact integers and
    * substrings, nothing float. */
  def ragChunksSql(maxTokens: Int, overlap: Int): String = {
    val stride = maxTokens - overlap
    s"WITH t AS ($toksCte), " +
      "s AS (SELECT doc_id, toks, len(toks) AS n, " +
      s"unnest(range(0, CAST(greatest(len(toks), 1) AS BIGINT), $stride)) AS start_tok, " +
      s"unnest(range(0, (CAST(greatest(len(toks), 1) AS BIGINT) + $stride - 1) // $stride)) AS chunk_id " +
      "FROM t) " +
      "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, " +
      "CAST(start_tok AS BIGINT) AS start_tok, " +
      s"CAST(least($maxTokens, n - start_tok) AS BIGINT) AS n_chunk_toks, " +
      s"array_to_string(list_slice(toks, start_tok + 1, start_tok + $maxTokens), ' ') AS chunk " +
      "FROM s ORDER BY doc_id, chunk_id"
  }

  /** Mirror of the chunk-level retrieval composition: RAG chunks become
    * the retrieval units (synthetic key = doc_id·100000 + chunk_id, the
    * Spark side's exact arithmetic), ranked by the whole bm25 pipeline
    * via [[bm25SqlFrom]], then the key splits back into (doc_id,
    * chunk_id) with integer div/mod. */
  def chunkRetrievalSql(maxTokens: Int, overlap: Int, queryTerms: Seq[String],
                        k: Int, k1: Double, b: Double,
                        excludeDocIds: Seq[Long] = Nil): String = {
    // excludeDocIds are PARENT doc ids: every chunk of an excluded doc
    // drops (the store side's cascade forget), and bm25SqlFrom derives
    // the corpus constants from the filtered CTE — the surviving CHUNK
    // corpus, exactly what the store's post-forget probe recomputes
    val excl =
      if (excludeDocIds.isEmpty) ""
      else s" WHERE doc_id NOT IN (${excludeDocIds.mkString(", ")})"
    val chunkToks =
      s"SELECT doc_id * 100000 + chunk_id AS doc_id, " +
        s"string_split(chunk, ' ') AS toks FROM (${ragChunksSql(maxTokens, overlap)}) ch$excl"
    s"SELECT doc_id // 100000 AS doc_id, doc_id % 100000 AS chunk_id, " +
      s"score, rn FROM (${bm25SqlFrom(chunkToks, queryTerms, k, k1, b)}) r " +
      "ORDER BY rn"
  }

  /** Mirror of TextAnalysis.bm25ProbeMany: each query's ranking is the
    * single-query bm25Sql verbatim (the operator pins per-query bitwise
    * equality with the single probe, so the oracle composes the proven
    * mirrors), stitched with the query id and unioned. */
  def bm25MultiSql(queries: Seq[(Long, Seq[String])], k: Int,
                   k1: Double, b: Double,
                   excludeIds: Seq[Long] = Nil): String =
    queries.map { case (qid, terms) =>
      s"SELECT CAST($qid AS BIGINT) AS query_id, doc_id, score, rn " +
        s"FROM (${bm25Sql(terms, k, k1, b, excludeIds)}) q$qid"
    }.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY query_id, rn")

  /** Mirror of Similarity.ivfPqSearchRefined: the ADC top-R candidate
    * set comes from the full ivfPqSearchSql CTEs at k = rerankR, then
    * the refine stage re-scores exactly — the same l2sqSql kernel both
    * engines already cross bitwise — rounds to 4 BEFORE ranking, ties
    * to the lowest neighbor id. */
  /** `excludeIds` additionally restricts the REFINE-stage e and q CTEs
    * (vector fetch + query resolution) — the stored semantics, where
    * both come from the vec store's liveView: a forgotten id cannot be
    * fetched even as a rerank candidate, and a forgotten QUERY id
    * resolves no vector and emits no rows (the hammingRefinedSql r18
    * discipline; without it parity relies on the query set staying
    * disjoint from the forget set). The nested propose stage's
    * codebook/coarse lookups are deliberately NOT restricted — the
    * quantizer is a frozen model artifact, not corpus membership. */
  def ivfPqRefinedSql(coarseIds: Seq[Long], codebookIds: Seq[Long], m: Int,
                      queryIds: Seq[Long], nprobe: Int, rerankR: Int,
                      k: Int, excludeNeighbors: Seq[Long] = Nil,
                      excludeIds: Seq[Long] = Nil): String =
    s"WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings${
      if (excludeIds.isEmpty) ""
      else s" WHERE vec_id NOT IN (${excludeIds.mkString(", ")})"}), " +
      s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      "cand AS (SELECT query_id, neighbor_id FROM " +
      s"(${ivfPqSearchSql(coarseIds, codebookIds, m, queryIds, nprobe, rerankR,
        excludeNeighbors = excludeNeighbors)}) c), " +
      // rank by the UNROUNDED exact distance (the l2sq kernel is bitwise
      // cross-engine); only the OUTPUT rounds — the ordering stays
      // immune to the round() half-boundary class
      "rf AS (SELECT cand.query_id, cand.neighbor_id, " +
      s"${l2sqSql("q.qv", "e.v")} AS d2raw " +
      "FROM cand JOIN e ON e.vec_id = cand.neighbor_id " +
      "JOIN q ON q.query_id = cand.query_id), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY d2raw, neighbor_id) AS rn FROM rf) " +
      s"SELECT query_id, neighbor_id, round(d2raw, 4) AS d2, " +
      s"CAST(rn AS BIGINT) AS rn FROM rk " +
      s"WHERE rn <= $k ORDER BY query_id, rn"

  /** Mirror of the INDEXED hybrid fusion ([[hybridRrfSql]]'s join/score
    * shape with the persisted-store retrievers): the lexical ranking is
    * bm25Sql over the surviving corpus (`excludeIds` = the forgotten
    * docs — the store serves them through the deletion-vector liveView
    * subtraction), the semantic ranking is ivfPqSearchSql with the same
    * ids excluded from the candidate set (the vector store's anti-join).
    * Both stores hold exact integers, so each probe is bitwise its
    * one-shot scorer over the surviving corpus and the fusion crosses
    * unrounded — same two-term left-associated RRF sum. */
  def hybridIndexedRrfSql(queryTerms: Seq[String], k1: Double, b: Double,
                          queryId: Long, coarseIds: Seq[Long],
                          codebookIds: Seq[Long], m: Int, nprobe: Int,
                          poolK: Int, kRrf: Int, topK: Int,
                          excludeIds: Seq[Long] = Nil): String =
    s"WITH lex AS (SELECT CAST($queryId AS BIGINT) AS query_id, " +
      "doc_id AS neighbor_id, rn FROM " +
      s"(${bm25Sql(queryTerms, poolK, k1, b, excludeIds)}) l), " +
      "sem AS (SELECT query_id, neighbor_id, rn FROM " +
      s"(${ivfPqSearchSql(coarseIds, codebookIds, m, Seq(queryId), nprobe,
        poolK, excludeIds)}) s), " +
      "f AS (SELECT coalesce(lex.query_id, sem.query_id) AS query_id, " +
      "coalesce(lex.neighbor_id, sem.neighbor_id) AS neighbor_id, " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + lex.rn AS DOUBLE), CAST(0 AS DOUBLE)) + " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + sem.rn AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf " +
      "FROM lex FULL OUTER JOIN sem ON lex.query_id = sem.query_id AND lex.neighbor_id = sem.neighbor_id), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn2 FROM f) " +
      s"SELECT query_id, neighbor_id, rrf, CAST(rn2 AS BIGINT) AS rn FROM rk WHERE rn2 <= $topK " +
      "ORDER BY rn"

  /** Mirror of Similarity.rrfFuseN over THREE rankings (exact-cosine,
    * IVF, PQ-ADC) — each re-derived by its own contract CTEs. The join
    * chain is left-folded exactly like the operator's `reduce` (bf⟗ivf,
    * then ⟗pq, keys coalesced at each step) and the score is the
    * left-associated three-term sum of coalesced CAST-to-DOUBLE integer
    * divisions in list order — bitwise with no rounding. */
  def rrfFusion3Sql(coarseIds: Seq[Long], nprobe: Int, codebookIds: Seq[Long],
                    m: Int, queryIds: Seq[Long], poolK: Int, kRrf: Int,
                    topK: Int): String = {
    val bf =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
        s"scored AS (SELECT query_id, e.vec_id AS neighbor_id, $cosSql AS sim " +
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM scored) " +
        s"SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= $poolK"
    s"WITH bf AS (SELECT * FROM ($bf) b), " +
      s"iv AS (SELECT query_id, neighbor_id, rn FROM (${annIvfRankedSql(coarseIds, queryIds, nprobe, poolK)}) i), " +
      s"pq AS (SELECT query_id, neighbor_id, rn FROM (${pqSearchSql(codebookIds, m, queryIds, poolK)}) p), " +
      "f0 AS (SELECT coalesce(bf.query_id, iv.query_id) AS query_id, " +
      "coalesce(bf.neighbor_id, iv.neighbor_id) AS neighbor_id, " +
      "bf.rn AS r0, iv.rn AS r1 " +
      "FROM bf FULL OUTER JOIN iv ON bf.query_id = iv.query_id AND bf.neighbor_id = iv.neighbor_id), " +
      "f AS (SELECT coalesce(f0.query_id, pq.query_id) AS query_id, " +
      "coalesce(f0.neighbor_id, pq.neighbor_id) AS neighbor_id, " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + f0.r0 AS DOUBLE), CAST(0 AS DOUBLE)) + " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + f0.r1 AS DOUBLE), CAST(0 AS DOUBLE)) + " +
      s"coalesce(CAST(1 AS DOUBLE) / CAST($kRrf + pq.rn AS DOUBLE), CAST(0 AS DOUBLE)) AS rrf " +
      "FROM f0 FULL OUTER JOIN pq ON f0.query_id = pq.query_id AND f0.neighbor_id = pq.neighbor_id), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rn2 FROM f) " +
      s"SELECT query_id, neighbor_id, rrf, CAST(rn2 AS BIGINT) AS rn FROM rk WHERE rn2 <= $topK " +
      "ORDER BY query_id, rn"
  }

  /** Mirror of Similarity.ivfPqSearch: coarse assignment + probe lists
    * via the annIvfSql ROW_NUMBER argmin (ties to lowest cell id), PQ
    * codes + distance tables via the pqSearchSql CTEs, candidates
    * restricted to probed cells, adist rounded before ranking.
    * `excludeNeighbors` mirrors a deletion-vector probe: rows removed
    * from the stored index drop out of the candidate set BEFORE
    * ranking (per-row adist is independent, so every surviving score
    * is unchanged — exactly the store-side anti-join). */
  def ivfPqSearchSql(coarseIds: Seq[Long], codebookIds: Seq[Long], m: Int,
                     queryIds: Seq[Long], nprobe: Int, k: Int,
                     excludeNeighbors: Seq[Long] = Nil,
                     candidatePred: Option[String] = None): String = {
    val exclN =
      (if (excludeNeighbors.isEmpty) ""
       else s" AND a.vec_id NOT IN (${excludeNeighbors.mkString(", ")})") +
        candidatePred.map(pr => s" AND ($pr)").getOrElse("")
    val cbValues = codebookIds.zipWithIndex
      .map { case (id, c) => s"($c, $id)" }.mkString(", ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"cells AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id IN (${coarseIds.mkString(", ")})), " +
      "ad0 AS (SELECT vec_id, cell_id, ROW_NUMBER() OVER (PARTITION BY vec_id " +
      s"ORDER BY ${l2sqSql("v", "cv")}, cell_id) AS rn FROM e CROSS JOIN cells), " +
      "assigned AS (SELECT vec_id, cell_id FROM ad0 WHERE rn = 1), " +
      s"cbm (code, cbid) AS (VALUES $cbValues), " +
      "cb AS (SELECT CAST(code AS BIGINT) AS code, v AS cv FROM cbm JOIN e ON e.vec_id = cbm.cbid), " +
      s"ss AS (SELECT CAST(range AS BIGINT) AS s FROM range($m)), " +
      s"sub AS (SELECT vec_id, s, list_slice(v, s*(len(v)//$m)+1, (s+1)*(len(v)//$m)) AS sv " +
      "FROM e CROSS JOIN ss), " +
      s"csub AS (SELECT code, s, list_slice(cv, s*(len(cv)//$m)+1, (s+1)*(len(cv)//$m)) AS cs " +
      "FROM cb CROSS JOIN ss), " +
      s"cd AS (SELECT vec_id, s, code, ${l2sqSql("sv", "cs")} AS d2 FROM sub JOIN csub USING (s)), " +
      "cr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d2, code) AS rn FROM cd), " +
      "codes AS (SELECT vec_id, s, code FROM cr WHERE rn = 1), " +
      s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      "pd AS (SELECT query_id, cell_id, ROW_NUMBER() OVER (PARTITION BY query_id " +
      s"ORDER BY ${l2sqSql("qv", "cv")}, cell_id) AS rn FROM q CROSS JOIN cells), " +
      s"probes AS (SELECT query_id, cell_id FROM pd WHERE rn <= $nprobe), " +
      s"qsub AS (SELECT query_id, s, list_slice(qv, s*(len(qv)//$m)+1, (s+1)*(len(qv)//$m)) AS qs " +
      "FROM q CROSS JOIN ss), " +
      s"dt AS (SELECT query_id, s, code, ${l2sqSql("qs", "cs")} AS qd FROM qsub JOIN csub USING (s)), " +
      "cand AS (SELECT p.query_id, a.vec_id AS neighbor_id FROM assigned a " +
      s"JOIN probes p ON a.cell_id = p.cell_id WHERE a.vec_id <> p.query_id$exclN), " +
      "ad AS (SELECT c.query_id, c.neighbor_id, round(sum(dt.qd), 4) AS adist " +
      "FROM cand c JOIN codes co ON co.vec_id = c.neighbor_id " +
      "JOIN dt ON dt.query_id = c.query_id AND dt.s = co.s AND dt.code = co.code " +
      "GROUP BY 1, 2), " +
      "rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rn FROM ad) " +
      s"SELECT query_id, neighbor_id, adist, CAST(rn AS BIGINT) AS rn FROM rk WHERE rn <= $k " +
      "ORDER BY query_id, rn"
  }

  /** Mirror of Similarity.ivfRecall: for each swept nprobe, the exact
    * cosine top-k pool (annTopKSql's CTEs, unrounded rank) left-joined
    * with the IVF result (annIvfSql — the ann_ivf contract CTEs), hit
    * counts as exact BIGINTs, recall one CAST-to-DOUBLE division —
    * bitwise with no rounding. */
  def ivfRecallSql(coarseIds: Seq[Long], queryIds: Seq[Long],
                   nprobes: Seq[Int], k: Int): String = {
    val arms = nprobes.map { np =>
      s"SELECT CAST($np AS BIGINT) AS nprobe, n_exact, n_found, " +
        "CAST(n_found AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall FROM (" +
        "SELECT CAST(count(*) AS BIGINT) AS n_exact, " +
        "CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_found " +
        s"FROM (SELECT query_id, neighbor_id FROM (${annTopKSql(queryIds, k)}) x) ex " +
        "LEFT JOIN (SELECT query_id, neighbor_id, 1 AS hit " +
        s"FROM (${annIvfSql(coarseIds, queryIds, np, k)}) a) ap " +
        "USING (query_id, neighbor_id))"
    }
    s"SELECT * FROM (${arms.mkString(" UNION ALL ")}) ORDER BY nprobe"
  }

  /** Mirror of Similarity.pqRecall: the exact reference is the
    * brute-force L2² top-k (PQ ranks by distance — grading against the
    * cosine ranking would conflate metric mismatch with quantization
    * error); one arm for pure PQ (nprobe = 0), one per swept nprobe for
    * IVF-PQ, each re-derived by its own contract CTEs (pqSearchSql /
    * ivfPqSearchSql). Counts exact BIGINTs, recall one CAST-to-DOUBLE
    * division — bitwise with no rounding. */
  def pqRecallSql(coarseIds: Seq[Long], codebookIds: Seq[Long], m: Int,
                  queryIds: Seq[Long], nprobes: Seq[Int], k: Int): String = {
    val exactL2 =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
        s"sc AS (SELECT query_id, e.vec_id AS neighbor_id, ${l2sqSql("qv", "v")} AS d2 " +
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn FROM sc) " +
        s"SELECT query_id, neighbor_id FROM r WHERE rn <= $k"
    def arm(method: String, np: Int, approxSql: String): String =
      s"SELECT '$method' AS method, CAST($np AS BIGINT) AS nprobe, n_exact, n_found, " +
        "CAST(n_found AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall FROM (" +
        "SELECT CAST(count(*) AS BIGINT) AS n_exact, " +
        "CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_found " +
        s"FROM (SELECT query_id, neighbor_id FROM ($exactL2) x) ex " +
        "LEFT JOIN (SELECT query_id, neighbor_id, 1 AS hit " +
        s"FROM ($approxSql) a) ap USING (query_id, neighbor_id))"
    val arms = arm("pq", 0, pqSearchSql(codebookIds, m, queryIds, k)) +:
      nprobes.map(np => arm("ivf_pq", np,
        ivfPqSearchSql(coarseIds, codebookIds, m, queryIds, np, k)))
    s"SELECT * FROM (${arms.mkString(" UNION ALL ")}) ORDER BY method, nprobe"
  }

  /** Mirror of Similarity.refineRecall — pqRecallSql's audit shape with
    * ivfPqRefinedSql as the approx arm per swept rerank budget. */
  def refineRecallSql(coarseIds: Seq[Long], codebookIds: Seq[Long], m: Int,
                      queryIds: Seq[Long], nprobe: Int, rerankRs: Seq[Int],
                      k: Int): String = {
    val exactL2 =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
        s"sc AS (SELECT query_id, e.vec_id AS neighbor_id, ${l2sqSql("qv", "v")} AS d2 " +
        "FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id), " +
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rn FROM sc) " +
        s"SELECT query_id, neighbor_id FROM r WHERE rn <= $k"
    val arms = rerankRs.map { r =>
      s"SELECT CAST($r AS BIGINT) AS rerank_r, n_exact, n_found, " +
        "CAST(n_found AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall FROM (" +
        "SELECT CAST(count(*) AS BIGINT) AS n_exact, " +
        "CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_found " +
        s"FROM (SELECT query_id, neighbor_id FROM ($exactL2) x) ex " +
        "LEFT JOIN (SELECT query_id, neighbor_id, 1 AS hit " +
        s"FROM (${ivfPqRefinedSql(coarseIds, codebookIds, m, queryIds,
          nprobe, r, k)}) a) ap USING (query_id, neighbor_id))"
    }
    s"SELECT * FROM (${arms.mkString(" UNION ALL ")}) ORDER BY rerank_r"
  }

  /** The order-invariant per-(cell, dim) mean shared by the vkmeans
    * mirrors: elements gridded onto VectorKMeans.GridScale (1e-6) and
    * scaled to BIGINT before the sum, so the aggregate is exact integer
    * arithmetic in BOTH engines regardless of summation order, and the
    * only float op is the single trailing division — mirrors
    * VectorKMeans.step's `sum(round(v*1e6).cast(long)) / (1e6 * n)`
    * exactly (1e6 is a DOUBLE literal on both sides; the count is cast
    * to DOUBLE before the multiply like Scala's Double*Long widening). */
  private def gridMeanSql(valExpr: String): String =
    s"CAST(sum(CAST(round($valExpr * 1e6) AS BIGINT)) AS DOUBLE) / (1e6 * CAST(count(*) AS DOUBLE))"

  /** Mirror of one VectorKMeans.step over the embeddings table: seeds
    * from the corpus by id ascending (cell = position), argmin
    * assignment with ties to the lowest cell, per-(cell, dim)
    * fixed-grid mean (gridMeanSql) rounded once to 4 (the a1_recenter
    * margin). PqCodebook-style ids are passed ascending so position
    * order == id order on both sides. */
  /** The vkmeans-step CTE chain through `g` (cell, dim, m on the exact
    * 1e-6 mean grid) — shared by the step mirror and the fitted-centroid
    * medoid mirror. */
  private def vkmeansStepCtes(seedIds: Seq[Long]): String = {
    val cmValues = seedIds.sorted.zipWithIndex
      .map { case (id, c) => s"($c, $id)" }.mkString(", ")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"cm (cell, cid) AS (VALUES $cmValues), " +
      "cents AS (SELECT CAST(cell AS BIGINT) AS cell, v AS cv FROM cm JOIN e ON e.vec_id = cm.cid), " +
      "ad AS (SELECT e.vec_id, v, cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
      s"ORDER BY ${l2sqSql("v", "cv")}, cell) AS rn FROM e CROSS JOIN cents), " +
      "a AS (SELECT vec_id, v, cell FROM ad WHERE rn = 1), " +
      "x AS (SELECT cell, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim, unnest(v) AS val FROM a), " +
      s"g AS (SELECT cell, dim, ${gridMeanSql("val")} AS m FROM x GROUP BY 1, 2)"
  }

  def vkmeansStepSql(seedIds: Seq[Long]): String =
    vkmeansStepCtes(seedIds) +
      // `+ 0.0` folds DuckDB's signed-zero round output (-0.0 for tiny
      // negative means) onto +0.0 — Scala BigDecimal has no -0.0, and the
      // driver hashes floats bitwise, so the zeros must match in SIGN too
      " SELECT cell, dim, round(m, 4) + 0.0 AS m FROM g ORDER BY cell, dim"

  /** The unrolled power-iteration step CTEs over matrix table `gTab`,
    * producing `$p1 .. $p$iters` direction CTEs (step t reads
    * `$p${t-1}`). Every CTE in these chains is AS MATERIALIZED: DuckDB
    * inlines plain CTEs per REFERENCE, and the deflated second-
    * component query references the gram scan through nested chains —
    * inlining expands it combinatorially (observed: "Too many open
    * files" from hundreds of re-opened parquet scans). Materialization
    * evaluates each CTE once, like Spark's persisted subplans. */
  private def powerSteps(gTab: String, p: String, iters: Int): String =
    (1 to iters).map { t =>
      s"${p}r$t AS MATERIALIZED (SELECT $gTab.i AS i, sum($gTab.g * v.val) AS raw " +
        s"FROM $gTab JOIN $p${t - 1} v ON $gTab.j = v.i GROUP BY $gTab.i), " +
        s"${p}n$t AS MATERIALIZED (SELECT sqrt(sum(raw*raw)) AS nrm FROM ${p}r$t), " +
        s"$p$t AS MATERIALIZED (SELECT i, round(raw / nrm, 6) AS val FROM ${p}r$t CROSS JOIN ${p}n$t)"
    }.mkString(", ")

  /** The shared WITH-clause of the power-iteration mirrors (the
    * Similarity.pcaPowerDirection contract): gram sums rounded to 6
    * decimals FIRST, then `iters` unrolled v ← round((G·v)/‖G·v‖, 6)
    * CTEs — the identical recurrence the driver runs, so directions
    * match without requiring convergence. Composed structurally, never
    * by string surgery on a finished query. */
  private def pcaCtes(iters: Int): String = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      "a AS (SELECT vec_id, CAST(generate_subscripts(v, 1) AS BIGINT) AS i, unnest(v) AS x FROM e), " +
      "g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, round(sum(a.x * b.x), 6) AS g " +
      "FROM a JOIN a b ON a.vec_id = b.vec_id GROUP BY 1, 2), " +
      "v0 AS (SELECT DISTINCT i, 1.0 AS val FROM g), " +
      powerSteps("g", "v", iters)
  }

  def pcaPowerSql(iters: Int): String =
    pcaCtes(iters) + s" SELECT i AS dim, val FROM v$iters ORDER BY dim"

  /** Mirror of Similarity.pcaSecondDirection: Rayleigh quotient of v₁
    * rounded to 6, Hotelling deflation G₂ = round(G − λ·v₁v₁ᵀ, 6),
    * then the identical power chain over G₂. */
  def pcaSecondSql(iters: Int): String =
    pcaCtes(iters) + ", " +
      s"lam AS MATERIALIZED (SELECT round(sum((vi.val * g.g) * vj.val), 6) AS lam " +
      s"FROM g JOIN v$iters vi ON g.i = vi.i JOIN v$iters vj ON g.j = vj.i), " +
      s"g2 AS MATERIALIZED (SELECT g.i AS i, g.j AS j, round(g.g - lam * (vi.val * vj.val), 6) AS g " +
      s"FROM g JOIN v$iters vi ON g.i = vi.i JOIN v$iters vj ON g.j = vj.i CROSS JOIN lam), " +
      "w0 AS (SELECT DISTINCT i, 1.0 AS val FROM g2), " +
      powerSteps("g2", "w", iters) +
      s" SELECT i AS dim, val FROM w$iters ORDER BY dim"

  /** Mirror of the q_pca_project composition: the same power-iteration
    * CTEs re-derive the direction, then every corpus vector dots
    * against it (list fold, same order as the Spark literal kernel). */
  def pcaProjectSql(iters: Int): String =
    pcaCtes(iters) +
      s", dv AS (SELECT array_agg(val ORDER BY i) AS w FROM v$iters) " +
      "SELECT vec_id, round(list_dot_product(v, w), 4) AS proj " +
      "FROM e CROSS JOIN dv ORDER BY vec_id"

  /** Mirror of the ITERATED vector K-Means chain (VectorKMeans.step
    * applied `iters` times with per-iteration 4-decimal centroid
    * rounding — the c2_iterate3 contract lifted to arbitrary
    * dimension). Each iteration: argmin assignment against the previous
    * (rounded) centroids, per-(cell, dim) fixed-grid mean (gridMeanSql,
    * order-invariant), and the keep-previous-
    * centroid branch for emptied cells as round(coalesce(new, prev), 4)
    * over a LEFT JOIN from the full (cell, dim) grid — exactly step's
    * `means.getOrElse(i, cents(i))` followed by the rounding both
    * engines share. */
  def vkmeansIterateSql(seedIds: Seq[Long], iters: Int): String = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val cmValues = seedIds.sorted.zipWithIndex
      .map { case (id, c) => s"($c, $id)" }.mkString(", ")
    val head =
      "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
        s"cm (cell, cid) AS (VALUES $cmValues), " +
        "g0 AS (SELECT CAST(cell AS BIGINT) AS cell, v AS cv FROM cm JOIN e ON e.vec_id = cm.cid), " +
        // the seed grid: (cell, dim, m) of the UNROUNDED seed vectors
        "c0 AS (SELECT cell, CAST(generate_subscripts(cv, 1) AS BIGINT) AS dim, " +
        "unnest(cv) AS m FROM g0)"
    val steps = (1 to iters).map { i =>
      val prev = s"c${i - 1}"
      // per-cell arrays of the previous grid (iteration 1 reuses the raw
      // seed vectors; rounding them first would round(x)=x-diverge from
      // Spark, which rounds only AFTER each step)
      s"g$i AS (SELECT cell, array_agg(m ORDER BY dim) AS cv FROM $prev GROUP BY cell), " +
        s"a$i AS (SELECT e.vec_id, v, cell, ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
        s"ORDER BY ${l2sqSql("v", "cv")}, cell) AS rn FROM e CROSS JOIN g$i), " +
        s"s$i AS (SELECT vec_id, v, cell FROM a$i WHERE rn = 1), " +
        s"x$i AS (SELECT cell, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim, " +
        s"unnest(v) AS val FROM s$i), " +
        s"m$i AS (SELECT cell, dim, ${gridMeanSql("val")} AS m FROM x$i GROUP BY 1, 2), " +
        // `+ 0.0`: signed-zero normalization, as in vkmeansStepSql
        s"c$i AS (SELECT p.cell, p.dim, round(coalesce(n.m, p.m), 4) + 0.0 AS m " +
        s"FROM $prev p LEFT JOIN m$i n ON p.cell = n.cell AND p.dim = n.dim)"
    }
    (head +: steps).mkString(", ") +
      s" SELECT cell, dim, m FROM c$iters ORDER BY cell, dim"
  }

  /** Mirror of TextAnalysis.unigramLogProb: same vocabulary aggregate,
    * same ln(c/N) per token, per-doc average rounded to 4. */
  val unigramLogProbSql: String =
    "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), " +
      "vc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY w), " +
      "n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM t) " +
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
      "round(sum(ln(CAST(c AS DOUBLE) / total)) / count(*), 4) AS avg_logprob " +
      "FROM t JOIN vc USING (w) CROSS JOIN n GROUP BY doc_id ORDER BY doc_id"

  /** Mirror of TextAnalysis.dsirScores: one vocab aggregate carrying
    * both counts, totals from a scalar CTE over it, each token's
    * log-ratio = ln(ONE division of two exact BIGINT products) — both
    * engines ln the same IEEE value — per-doc sum rounded to 4 (+ 0.0
    * normalizes a hypothetical −0.0), selection rank on the rounded
    * score (bitwise cross-engine, so the rank is total). */
  def dsirSql(targetLang: String, topN: Int): String =
    s"WITH t AS (SELECT doc_id, lang = '$targetLang' AS tgt, " +
      "unnest(string_split(text, ' ')) AS w FROM documents), " +
      "vc AS (SELECT w, CAST(count(*) AS BIGINT) AS cr, " +
      "CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct FROM t GROUP BY w), " +
      "n AS (SELECT CAST(sum(cr) AS BIGINT) AS nraw, CAST(sum(ct) AS BIGINT) AS ntgt, " +
      "CAST(count(*) AS BIGINT) AS v FROM vc), " +
      "sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, " +
      "round(sum(ln(CAST((ct + 1) * (nraw + v) AS DOUBLE) / " +
      "CAST((cr + 1) * (ntgt + v) AS DOUBLE))), 4) + 0.0 AS dsir_score " +
      "FROM t JOIN vc USING (w) CROSS JOIN n GROUP BY doc_id) " +
      "SELECT doc_id, n_tokens, dsir_score, " +
      s"row_number() OVER (ORDER BY dsir_score DESC, doc_id) <= $topN AS selected " +
      "FROM sc ORDER BY doc_id"

  /** Mirror of TextAnalysis.bigramLogProb: same bigram/unigram
    * aggregates, per-transition double built with IDENTICAL literals
    * and operation order (λ and 1−λ are interpolated from the same
    * Scala doubles — shortest-repr toString round-trips through
    * DuckDB's parser to the same IEEE value), per-doc average rounded
    * to 4 (+ 0.0 normalizes a hypothetical −0.0; Spark's
    * BigDecimal round can't emit one). */
  def bigramLogProbSql(lambda: Double): String = {
    val mu = 1.0 - lambda
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
      "tok AS (SELECT doc_id, unnest(toks) AS w FROM t), " +
      "n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok), " +
      "uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM tok GROUP BY w), " +
      "bgp AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t), " +
      "bg AS (SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur FROM bgp), " +
      "bc AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY prev, cur), " +
      "sc AS (SELECT doc_id, " +
      s"ln($lambda * (CAST(cb AS DOUBLE) / CAST(up.cu AS DOUBLE)) + " +
      s"$mu * (CAST(uc.cu AS DOUBLE) / CAST(total AS DOUBLE))) AS lp " +
      "FROM bg JOIN bc USING (prev, cur) " +
      "JOIN uni up ON bg.prev = up.w JOIN uni uc ON bg.cur = uc.w CROSS JOIN n), " +
      "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, " +
      "round(sum(lp) / count(*), 4) + 0.0 AS avg_logprob FROM sc GROUP BY doc_id) " +
      "SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams, avg_logprob " +
      "FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id"
  }

  /** Mirror of TextAnalysis.trigramBackoffScore with the model = docs
    * whose doc_id % `mod` = 0. The LEFT-join null pattern IS the
    * backoff ladder; each branch's double is built with the same
    * literals and nesting as the Spark side (θ·(θ·x), ln inside the
    * branch), integer counts CAST to DOUBLE before dividing. */
  def trigramBackoffSql(mod: Int, theta: Double): String =
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), " +
      s"m AS (SELECT toks FROM t WHERE doc_id % $mod = 0), " +
      "mtok AS (SELECT unnest(toks) AS w FROM m), " +
      "n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM mtok), " +
      "uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cu FROM mtok GROUP BY w), " +
      "mbgp AS (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM m), " +
      "mbc AS (SELECT toks[i] AS w1, toks[i+1] AS w2, CAST(count(*) AS BIGINT) AS cb " +
      "FROM mbgp GROUP BY 1, 2), " +
      "mtgp AS (SELECT toks, unnest(generate_series(1, len(toks) - 2)) AS i FROM m), " +
      "mtc AS (SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3, " +
      "CAST(count(*) AS BIGINT) AS ct FROM mtgp GROUP BY 1, 2, 3), " +
      "dtgp AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 2)) AS i FROM t), " +
      "dtg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3 FROM dtgp), " +
      "sc AS (SELECT doc_id, " +
      "CASE WHEN ct IS NOT NULL THEN ln(CAST(ct AS DOUBLE) / CAST(b12.cb AS DOUBLE)) " +
      s"WHEN b23.cb IS NOT NULL THEN ln($theta * (CAST(b23.cb AS DOUBLE) / CAST(u2.cu AS DOUBLE))) " +
      s"WHEN u3.cu IS NOT NULL THEN ln($theta * ($theta * (CAST(u3.cu AS DOUBLE) / CAST(total AS DOUBLE)))) " +
      s"ELSE ln($theta * ($theta * (1.0 / CAST(total AS DOUBLE)))) END AS lp " +
      "FROM dtg " +
      "LEFT JOIN mtc USING (w1, w2, w3) " +
      "LEFT JOIN mbc b12 ON dtg.w1 = b12.w1 AND dtg.w2 = b12.w2 " +
      "LEFT JOIN mbc b23 ON dtg.w2 = b23.w1 AND dtg.w3 = b23.w2 " +
      "LEFT JOIN uni u2 ON dtg.w2 = u2.w " +
      "LEFT JOIN uni u3 ON dtg.w3 = u3.w " +
      "CROSS JOIN n), " +
      "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams, " +
      "round(sum(lp) / count(*), 4) + 0.0 AS avg_logprob FROM sc GROUP BY doc_id) " +
      "SELECT d.doc_id, coalesce(n_trigrams, 0) AS n_trigrams, avg_logprob " +
      "FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id ORDER BY d.doc_id"

  def annIvfSql(coarseIds: Seq[Long], queryIds: Seq[Long], nprobe: Int, k: Int): String =
    annIvfCore(coarseIds, queryIds, nprobe) +
      s"SELECT query_id, neighbor_id, round(sim, 4) AS sim FROM r WHERE rn <= $k " +
      "ORDER BY query_id, neighbor_id"

  /** Ranked form of [[annIvfSql]] for rank-fusion consumers — mirror of
    * Similarity.ivfTopKRanked: same CTEs, rank from the same unrounded
    * (sim DESC, neighbor_id) window. */
  def annIvfRankedSql(coarseIds: Seq[Long], queryIds: Seq[Long], nprobe: Int, k: Int): String =
    annIvfCore(coarseIds, queryIds, nprobe) +
      s"SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= $k"

  /** Mirror of Similarity.cellBalancedSample: the annIvfSql argmin cell
    * assignment (ties to lowest cell_id), then the per-cell top-quota by
    * the SAME multiplicative draw hash — all-integer, no rounding. */
  def cellSampleSql(coarseIds: Seq[Long], quota: Int): String = {
    val m = graft.llm.Similarity.DrawMod
    val mult = graft.llm.Similarity.DrawMult
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"coarse AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id IN (${coarseIds.mkString(", ")})), " +
      "ad AS (SELECT vec_id, cell_id, ROW_NUMBER() OVER (PARTITION BY vec_id " +
      s"ORDER BY ${l2sqSql("v", "cv")}, cell_id) AS rn FROM e CROSS JOIN coarse), " +
      "assigned AS (SELECT vec_id, cell_id FROM ad WHERE rn = 1), " +
      s"d AS (SELECT cell_id, vec_id, (vec_id % $m) * $mult % $m AS draw FROM assigned), " +
      "r AS (SELECT cell_id, vec_id, ROW_NUMBER() OVER (PARTITION BY cell_id " +
      "ORDER BY draw, vec_id) AS rn FROM d) " +
      s"SELECT cell_id, vec_id, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= $quota " +
      "ORDER BY cell_id, rn"
  }

  /** Mirror of Similarity.cellMedoids over centroids fitted by one
    * VectorKMeans step: the vkmeansStepSql CTE chain produces the
    * round-4-grid (cell, dim, m) means bitwise; each cell's centroid
    * array reassembles via `list(... ORDER BY dim)`, corpus vectors
    * re-assign to the fitted cells (argmin, ties to lowest cell), and
    * the medoid is the member with the smallest (d2, vec_id) — d2 is
    * ordering-only; the emitted columns are all integers. */
  def cellMedoidSql(seedIds: Seq[Long]): String =
    vkmeansStepCtes(seedIds) + ", " +
      "cf AS (SELECT cell AS cell_id, list(round(m, 4) + 0.0 ORDER BY dim) AS cv " +
      "FROM g GROUP BY cell), " +
      s"ad2 AS (SELECT e.vec_id, cell_id, ${l2sqSql("v", "cv")} AS d2, " +
      "ROW_NUMBER() OVER (PARTITION BY e.vec_id " +
      s"ORDER BY ${l2sqSql("v", "cv")}, cell_id) AS rn FROM e CROSS JOIN cf), " +
      "asg AS (SELECT vec_id, cell_id, d2 FROM ad2 WHERE rn = 1), " +
      "med AS (SELECT cell_id, vec_id, ROW_NUMBER() OVER (PARTITION BY cell_id " +
      "ORDER BY d2, vec_id) AS mrn, COUNT(*) OVER (PARTITION BY cell_id) AS n " +
      "FROM asg) " +
      "SELECT cell_id, vec_id AS medoid_id, CAST(n AS BIGINT) AS n_members " +
      "FROM med WHERE mrn = 1 ORDER BY cell_id"

  /** Mirror of TextAnalysis.mixtureWeights: same bottleneck argmin (one
    * IEEE division of exact BIGINTs, ties to smallest source), same
    * exact-integer expected_tokens, accept_frac as ONE division of two
    * CAST-to-DOUBLE exact-integer products — bitwise with no rounding. */
  def mixtureSql(weights: Seq[(String, Long)]): String = {
    val values = weights.map { case (s, w) => s"('$s', $w)" }.mkString(", ")
    s"WITH w (source, weight) AS (VALUES $values), " +
      "a AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens " +
      "FROM documents GROUP BY source), " +
      "j AS (SELECT a.source, avail_tokens, CAST(w.weight AS BIGINT) AS weight " +
      "FROM a JOIN w USING (source)), " +
      "b AS (SELECT avail_tokens AS ab, weight AS wb FROM j " +
      "ORDER BY CAST(avail_tokens AS DOUBLE) / CAST(weight AS DOUBLE), source LIMIT 1) " +
      "SELECT source, avail_tokens, weight, (weight * ab) // wb AS expected_tokens, " +
      "CAST(weight * ab AS DOUBLE) / CAST(wb * avail_tokens AS DOUBLE) AS accept_frac " +
      "FROM j CROSS JOIN b ORDER BY source"
  }

  private def annIvfCore(coarseIds: Seq[Long], queryIds: Seq[Long], nprobe: Int): String =
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings), " +
      s"coarse AS (SELECT vec_id AS cell_id, v AS cv FROM e WHERE vec_id IN (${coarseIds.mkString(", ")})), " +
      "ad AS (SELECT vec_id, v, cell_id, ROW_NUMBER() OVER (PARTITION BY vec_id " +
      s"ORDER BY ${l2sqSql("v", "cv")}, cell_id) AS rn FROM e CROSS JOIN coarse), " +
      "assigned AS (SELECT vec_id, v, cell_id FROM ad WHERE rn = 1), " +
      s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN (${queryIds.mkString(", ")})), " +
      "pd AS (SELECT query_id, qv, cell_id, ROW_NUMBER() OVER (PARTITION BY query_id " +
      s"ORDER BY ${l2sqSql("qv", "cv")}, cell_id) AS rn FROM q CROSS JOIN coarse), " +
      s"probes AS (SELECT query_id, qv, cell_id FROM pd WHERE rn <= $nprobe), " +
      s"scored AS (SELECT query_id, vec_id AS neighbor_id, $cosSql AS sim " +
      "FROM assigned JOIN probes USING (cell_id) WHERE vec_id <> query_id), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn FROM scored) "

  /** Mirror of TextAnalysis.gopherRules: same rule thresholds, same
    * single int/int divisions (bitwise-equal across engines), anchored
    * regexp with shared Java-regex/RE2 semantics. */
  def gopherSql(minWords: Int, maxWords: Int, minAvgLen: Double, maxAvgLen: Double,
                minStopHits: Int, minAlphaFrac: Double): String = {
    val stop = strList(TextAnalysis.Stopwords)
    s"WITH t AS ($toksCte), " +
      "s AS (SELECT doc_id, len(toks) AS n_words, " +
      "list_sum(list_transform(toks, t -> len(t)))/len(toks) AS mean_word_len, " +
      s"len(list_filter($stop, w -> list_contains(toks, w))) AS n_stop_distinct, " +
      "len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]+$')))/len(toks) AS alpha_frac " +
      "FROM t) " +
      "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len, " +
      "CAST(n_stop_distinct AS BIGINT) AS n_stop_distinct, alpha_frac, " +
      s"(n_words >= $minWords AND n_words <= $maxWords AND " +
      s"mean_word_len >= $minAvgLen AND mean_word_len <= $maxAvgLen AND " +
      s"n_stop_distinct >= $minStopHits AND alpha_frac >= $minAlphaFrac) AS passes " +
      "FROM s ORDER BY doc_id"
  }

  /** Mirror of Dedup.lshCurve — generated from the SAME left-folded
    * multiplication structure, so the IEEE op sequence is identical
    * and the curve is bitwise with no rounding. */
  def lshCurveSql(bands: Int, rows: Int, gridN: Int): String = {
    def powN(e: String, n: Int): String =
      (2 to n).foldLeft(e)((acc, _) => s"($acc * $e)")
    val s = s"(CAST(i AS DOUBLE) / $gridN.0)"
    val pBand = powN(s, rows)
    val pDetect = s"1.0 - ${powN(s"(1.0 - $pBand)", bands)}"
    s"SELECT i, $s AS s, $pBand AS p_band, $pDetect AS p_detect " +
      s"FROM range(1, $gridN) t(i) ORDER BY i"
  }

  /** Mirror of TextAnalysis.hashedTf: every token through the shared
    * polynomial fingerprint mod `dim`, bucketed counts as BIGINT
    * columns — all integers, no float discipline. */
  def hashedTfSql(dim: Int): String = {
    val dims = (0 until dim).map(j =>
      s"CAST(sum(CASE WHEN h = $j THEN 1 ELSE 0 END) AS BIGINT) AS d$j").mkString(", ")
    s"WITH t AS ($toksCte), " +
      "e AS (SELECT doc_id, unnest(toks) AS w FROM t), " +
      s"h AS (SELECT doc_id, ${polyHashSql("w")} % $dim AS h FROM e) " +
      s"SELECT doc_id, $dims FROM h GROUP BY doc_id ORDER BY doc_id"
  }

  /** Generic mirror of TextAnalysis.madOutliersOn: doubled order
    * statistics keep median and MAD in exact BIGINT space (med2 = x_lo
    * + x_hi, dev2 = 2|x − med|, mad2 = 4·MAD); the gate 2·dev2 >
    * k·mad2 is exactly |x − med| > k·MAD with no float anywhere. */
  def madGateSql(from: String, id: String, grp: String, value: String,
                 k: Int, orderBy: String): String =
    s"WITH base AS ($from), " +
      s"w AS (SELECT $id, $grp, $value, " +
      s"ROW_NUMBER() OVER (PARTITION BY $grp ORDER BY $value, $id) AS rn, " +
      s"count(*) OVER (PARTITION BY $grp) AS n FROM base), " +
      "m AS (SELECT *, " +
      s"sum(CASE WHEN rn = (n + 1) // 2 THEN $value ELSE 0 END) OVER (PARTITION BY $grp) + " +
      s"sum(CASE WHEN rn = (n + 2) // 2 THEN $value ELSE 0 END) OVER (PARTITION BY $grp) AS med2 FROM w), " +
      s"v AS (SELECT *, abs(2 * $value - med2) AS dev2 FROM m), " +
      s"w2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY $grp ORDER BY dev2, $id) AS rn2 FROM v), " +
      "m2 AS (SELECT *, " +
      s"sum(CASE WHEN rn2 = (n + 1) // 2 THEN dev2 ELSE 0 END) OVER (PARTITION BY $grp) + " +
      s"sum(CASE WHEN rn2 = (n + 2) // 2 THEN dev2 ELSE 0 END) OVER (PARTITION BY $grp) AS mad2 FROM w2) " +
      s"SELECT $id, $grp, CAST($value AS BIGINT) AS $value, CAST(med2 AS BIGINT) AS med2, " +
      "CAST(dev2 AS BIGINT) AS dev2, CAST(mad2 AS BIGINT) AS mad2 " +
      s"FROM m2 WHERE 2 * dev2 > $k * mad2 ORDER BY $orderBy"

  def madOutliersSql(k: Int): String =
    madGateSql("SELECT doc_id, source, n_chars FROM documents",
      "doc_id", "source", "n_chars", k, "doc_id")

  /** Mirror of q_event_anomaly: hourly counts per event type through
    * the same exact-integer MAD gate. */
  def eventAnomalySql(k: Int): String =
    madGateSql("SELECT event_type, epoch_us(ts) // 3600000000 AS hour, " +
      "count(*) AS n_events FROM events GROUP BY 1, 2",
      "hour", "event_type", "n_events", k, "event_type, hour")

  /** Mirror of TextAnalysis.datasheet: the gopherSql per-doc flags with
    * source/lang/text carried, a text-partition window for corpus-wide
    * dup status, (source, lang) aggregate re-agged to sources; dominant
    * language via ROW_NUMBER (nd DESC, lang) = the min(struct(-nd,
    * lang)) argmax; every fraction ONE division of two CAST-to-DOUBLE
    * exact BIGINTs. */
  def datasheetSql(minWords: Int, maxWords: Int, minAvgLen: Double, maxAvgLen: Double,
                   minStopHits: Int, minAlphaFrac: Double,
                   from: String = "documents"): String = {
    val stop = strList(TextAnalysis.Stopwords)
    s"WITH t AS (SELECT doc_id, source, lang, text, string_split(text, ' ') AS toks FROM $from), " +
      "s AS (SELECT source, lang, text, len(toks) AS n_words, " +
      "list_sum(list_transform(toks, t -> len(t)))/len(toks) AS mean_word_len, " +
      s"len(list_filter($stop, w -> list_contains(toks, w))) AS n_stop_distinct, " +
      "len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]+$')))/len(toks) AS alpha_frac " +
      "FROM t), " +
      "f AS (SELECT source, lang, n_words, " +
      s"(n_words >= $minWords AND n_words <= $maxWords AND " +
      s"mean_word_len >= $minAvgLen AND mean_word_len <= $maxAvgLen AND " +
      s"n_stop_distinct >= $minStopHits AND alpha_frac >= $minAlphaFrac) AS passes, " +
      "(count(*) OVER (PARTITION BY text) > 1) AS dup FROM s), " +
      "pl AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS nd, " +
      "CAST(sum(n_words) AS BIGINT) AS nt, " +
      "CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS np, " +
      "CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS ndup " +
      "FROM f GROUP BY 1, 2), " +
      "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY nd DESC, lang) AS rn FROM pl), " +
      "a AS (SELECT source, CAST(sum(nd) AS BIGINT) AS n_docs, " +
      "CAST(count(*) AS BIGINT) AS n_langs, CAST(sum(nt) AS BIGINT) AS n_tokens, " +
      "CAST(sum(np) AS BIGINT) AS n_gopher_pass, CAST(sum(ndup) AS BIGINT) AS n_dup_docs " +
      "FROM r GROUP BY 1), " +
      "tl AS (SELECT source, lang AS top_lang FROM r WHERE rn = 1) " +
      "SELECT source, n_docs, n_langs, top_lang, n_tokens, " +
      "CAST(n_tokens AS DOUBLE)/CAST(n_docs AS DOUBLE) AS avg_doc_tokens, " +
      "n_gopher_pass, CAST(n_gopher_pass AS DOUBLE)/CAST(n_docs AS DOUBLE) AS pass_frac, " +
      "n_dup_docs, CAST(n_dup_docs AS DOUBLE)/CAST(n_docs AS DOUBLE) AS dup_frac " +
      "FROM a JOIN tl USING (source) ORDER BY source"
  }

  /** Mirror of DataQuality.corpusCardDiff: the snapshot-diff bands
    * pivoted wide + each release's datasheet INTEGER card (nested
    * [[datasheetSql]] subqueries over the two snapshot CTEs — one
    * definition of the card, so single-operator and composed oracles
    * cannot drift) + the token delta. All BIGINTs — bitwise with no
    * float discipline. `oldCte`/`newCte` are full SELECTs producing
    * (doc_id, text, source, lang). */
  def corpusCardDiffSql(minWords: Int, maxWords: Int, minAvgLen: Double,
                        maxAvgLen: Double, minStopHits: Int,
                        minAlphaFrac: Double,
                        oldCte: String, newCte: String): String = {
    def card(rel: String) =
      "SELECT source, n_docs, n_tokens, n_gopher_pass, n_dup_docs FROM (" +
        datasheetSql(minWords, maxWords, minAvgLen, maxAvgLen,
          minStopHits, minAlphaFrac, rel) + ")"
    s"WITH oldsnap AS ($oldCte), newsnap AS ($newCte), " +
      "o AS (SELECT doc_id, md5(text) AS oh, source AS osrc FROM oldsnap), " +
      "n AS (SELECT doc_id, md5(text) AS nh, source AS nsrc FROM newsnap), " +
      "j AS (SELECT coalesce(nsrc, osrc) AS source, " +
      "CASE WHEN oh IS NULL THEN 'added' WHEN nh IS NULL THEN 'removed' " +
      "WHEN oh <> nh THEN 'changed' ELSE 'unchanged' END AS status " +
      "FROM o FULL OUTER JOIN n USING (doc_id)), " +
      "bands AS (SELECT source, " +
      "CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added, " +
      "CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
      "CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed, " +
      "CAST(sum(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged " +
      "FROM j GROUP BY 1), " +
      s"oc AS (${card("oldsnap")}), " +
      s"nc AS (${card("newsnap")}) " +
      "SELECT coalesce(bands.source, oc.source, nc.source) AS source, " +
      "coalesce(n_added, 0) AS n_added, coalesce(n_removed, 0) AS n_removed, " +
      "coalesce(n_changed, 0) AS n_changed, coalesce(n_unchanged, 0) AS n_unchanged, " +
      "coalesce(oc.n_docs, 0) AS docs_old, coalesce(nc.n_docs, 0) AS docs_new, " +
      "coalesce(oc.n_tokens, 0) AS tokens_old, coalesce(nc.n_tokens, 0) AS tokens_new, " +
      "coalesce(nc.n_tokens, 0) - coalesce(oc.n_tokens, 0) AS token_delta, " +
      "coalesce(oc.n_gopher_pass, 0) AS pass_old, coalesce(nc.n_gopher_pass, 0) AS pass_new, " +
      "coalesce(oc.n_dup_docs, 0) AS dup_old, coalesce(nc.n_dup_docs, 0) AS dup_new " +
      "FROM bands FULL OUTER JOIN oc ON bands.source = oc.source " +
      "FULL OUTER JOIN nc ON coalesce(bands.source, oc.source) = nc.source " +
      "ORDER BY source"
  }

  /** Mirror of TextAnalysis.qualityClassifier — generated from the
    * SAME tenth-quantized weight constants. All features are BIGINT
    * counts and the score is the exact integer numerator over 12000·n,
    * emitted as one division of two CAST-to-DOUBLE exact integers —
    * bitwise cross-engine by construction, no round() anywhere (a
    * float-chain + round formulation hit a real .00005 boundary where
    * the engines' round semantics diverge; see the operator scaladoc). */
  def qualityClassifierSql: String = {
    import TextAnalysis._
    val stop = strList(Stopwords)
    s"WITH t AS ($toksCte), " +
      "f AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, " +
      s"CAST(len(list_filter(toks, w -> list_contains($stop, w))) AS BIGINT) AS a, " +
      "CAST(len(list_filter(toks, w -> regexp_matches(w, '^[A-Za-z]+$'))) AS BIGINT) AS b, " +
      "CAST(len(list_filter(toks, w -> regexp_matches(w, '[0-9]'))) AS BIGINT) AS c, " +
      "CAST(len(list_distinct(toks)) AS BIGINT) AS d, " +
      "CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS s FROM t), " +
      s"sc AS (SELECT doc_id, n_tokens, CAST(${QcBiasT * 1200}*n_tokens " +
      s"+ ${QcStopT * 1200}*a + ${QcAlphaT * 1200}*b - ${QcDigitT * 1200}*c " +
      s"+ ${QcDistinctT * 1200}*d + ${QcLenT * 6}*n_tokens*least(200, n_tokens) " +
      s"- ${QcAvgLenT * 100}*least(12*n_tokens, s) AS DOUBLE) " +
      "/ CAST(12000*n_tokens AS DOUBLE) AS score FROM f) " +
      s"SELECT doc_id, n_tokens, score, score >= $QcThreshold AS keep " +
      "FROM sc ORDER BY doc_id"
  }

  /** Shared CTE chain of the BPE trainer mirrors: stages s0..sN of the
    * vocabulary's symbol strings, pair tables p1..pN, best-pair rows
    * b1..bN. Every s{i} is referenced twice (by p{i+1} and s{i+1}), so
    * the stages are MATERIALIZED — inlining would expand the chain
    * exponentially (the PCA-deflation precedent). The best pair rides
    * ONE string "lhs rhs"; symbols never contain spaces and ' ' (0x20)
    * sorts below every symbol character, so ORDER BY (n DESC, pr) is
    * exactly the Spark side's (n DESC, lhs, rhs). The merge apply is
    * the operator's single literal replace of " lhs  rhs " over the
    * TWO-space-separated symbol string (see bpeTrain's scaladoc for
    * why the doubled separator makes literal replace exactly greedy). */
  private def bpeChain(nMerges: Int): String = {
    val stages = (1 to nMerges).map { i =>
      s"p$i AS MATERIALIZED (SELECT pr, CAST(sum(wc) AS BIGINT) AS n FROM (" +
        s"SELECT wc, unnest(list_transform(range(1, len(syms)), " +
        s"j -> syms[j::INT] || ' ' || syms[(j+1)::INT])) AS pr " +
        s"FROM (SELECT wc, string_split(trim(s), '  ') AS syms FROM s${i - 1})) GROUP BY pr), " +
        s"b$i AS MATERIALIZED (SELECT pr, n FROM p$i ORDER BY n DESC, pr LIMIT 1), " +
        s"s$i AS MATERIALIZED (SELECT w, wc, replace(s, b.pat, b.rep) AS s " +
        s"FROM s${i - 1}, (SELECT ' ' || replace(pr, ' ', '  ') || ' ' AS pat, " +
        s"' ' || replace(pr, ' ', '') || ' ' AS rep FROM b$i) b)"
    }.mkString(", ")
    "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents), " +
      "wc AS (SELECT w, CAST(count(*) AS BIGINT) AS wc FROM tok GROUP BY w), " +
      "s0 AS MATERIALIZED (SELECT w, wc, " +
      "'  ' || regexp_replace(w, '(.)', '\\1  ', 'g') AS s FROM wc), " +
      stages
  }

  /** Mirror of TextAnalysis.bpeTrain: the ranked merge table. */
  def bpeTrainSql(nMerges: Int): String = {
    val rows = (1 to nMerges).map { i =>
      s"SELECT CAST($i AS BIGINT) AS rn, string_split(pr, ' ')[1] AS lhs, " +
        s"string_split(pr, ' ')[2] AS rhs, n FROM b$i"
    }.mkString(" UNION ALL ")
    s"${bpeChain(nMerges)} SELECT * FROM ($rows) ORDER BY rn"
  }

  /** Mirror of TextAnalysis.bpeEncode: per-doc subword token counts
    * under the trained merges. */
  def bpeEncodeSql(nMerges: Int): String =
    s"${bpeChain(nMerges)}, " +
      s"sub AS (SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sub FROM s$nMerges), " +
      "tok2 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) " +
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, " +
      "CAST(sum(n_sub) AS BIGINT) AS n_subtokens " +
      "FROM tok2 JOIN sub USING (w) GROUP BY doc_id ORDER BY doc_id"

  /** Mirror of TextAnalysis.langIdTrigram: one char-trigram CTE feeding
    * both the per-language and per-document rank profiles (MATERIALIZED
    * — two consumers), out-of-place distances with the max penalty for
    * absent grams, argmin via a (dist, lang) window. All integers. */
  def langIdTrigramSql(profileK: Int, docK: Int): String =
    "WITH g AS MATERIALIZED (SELECT doc_id, lang, unnest(CASE WHEN len(text) >= 3 THEN " +
      "list_transform(range(1, len(text)-1), i -> substr(text, i::INT, 3)) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS g FROM documents), " +
      "lc AS (SELECT lang, g, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY lang, g), " +
      "lp AS MATERIALIZED (SELECT lang AS plang, g, rl FROM (SELECT lang, g, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, g) AS BIGINT) AS rl FROM lc) " +
      s"WHERE rl <= $profileK), " +
      "dc AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY doc_id, g), " +
      "dp AS MATERIALIZED (SELECT doc_id, g, rd FROM (SELECT doc_id, g, " +
      "CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, g) AS BIGINT) AS rd FROM dc) " +
      s"WHERE rd <= $docK), " +
      "langs AS (SELECT DISTINCT plang FROM lp), " +
      s"pen AS (SELECT dp.doc_id, l.plang, coalesce(abs(dp.rd - lp.rl), $profileK) AS p " +
      "FROM dp CROSS JOIN langs l LEFT JOIN lp ON lp.plang = l.plang AND lp.g = dp.g), " +
      "ds AS (SELECT doc_id, plang, CAST(sum(p) AS BIGINT) AS dist FROM pen GROUP BY doc_id, plang), " +
      "best AS (SELECT doc_id, plang AS pred_lang, dist FROM (SELECT *, " +
      "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, plang) AS rn FROM ds) WHERE rn = 1) " +
      "SELECT d.doc_id, d.lang, b.pred_lang, b.dist, b.pred_lang = d.lang AS correct " +
      "FROM documents d LEFT JOIN best b ON d.doc_id = b.doc_id ORDER BY d.doc_id"

  /** Mirror of TextAnalysis.qualityQuantileFilter: the same exact-grid
    * classifier score with `source` carried, ranked per source by
    * (score DESC, doc_id) — a total order, so percent_rank is a single
    * small-integer IEEE division (q_percent_rank precedent) and the
    * keep bit compares identical doubles against CAST(q AS DOUBLE). */
  def qualityQuantileSql(q: Double): String = {
    import TextAnalysis._
    val stop = strList(Stopwords)
    "WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents), " +
      "f AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_tokens, " +
      s"CAST(len(list_filter(toks, w -> list_contains($stop, w))) AS BIGINT) AS a, " +
      "CAST(len(list_filter(toks, w -> regexp_matches(w, '^[A-Za-z]+$'))) AS BIGINT) AS b, " +
      "CAST(len(list_filter(toks, w -> regexp_matches(w, '[0-9]'))) AS BIGINT) AS c, " +
      "CAST(len(list_distinct(toks)) AS BIGINT) AS d, " +
      "CAST(list_sum(list_transform(toks, w -> len(w))) AS BIGINT) AS s FROM t), " +
      s"sc AS (SELECT doc_id, source, CAST(${QcBiasT * 1200}*n_tokens " +
      s"+ ${QcStopT * 1200}*a + ${QcAlphaT * 1200}*b - ${QcDigitT * 1200}*c " +
      s"+ ${QcDistinctT * 1200}*d + ${QcLenT * 6}*n_tokens*least(200, n_tokens) " +
      s"- ${QcAvgLenT * 100}*least(12*n_tokens, s) AS DOUBLE) " +
      "/ CAST(12000*n_tokens AS DOUBLE) AS score FROM f), " +
      "pr AS (SELECT doc_id, source, score, percent_rank() OVER " +
      "(PARTITION BY source ORDER BY score DESC, doc_id) AS pr FROM sc) " +
      s"SELECT doc_id, source, score, pr, pr <= CAST($q AS DOUBLE) AS keep " +
      "FROM pr ORDER BY doc_id"
  }

  /** Mirror of Dedup.contaminationScore: distinct n-grams per doc, LEFT
    * probe against the eval-doc gram set, per-doc hit counts + the
    * unrounded fraction (ONE division of two CAST-to-DOUBLE exact
    * BIGINTs — bitwise cross-engine, the qualityClassifier pattern). */
  def contaminationScoreSql(n: Int, benchMod: Int): String = {
    val gram = (0 until n).map(o => s"toks[(i+$o)::INT]").mkString(" || ' ' || ")
    s"WITH t AS ($toksCte), " +
      s"g AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= $n THEN " +
      s"list_distinct(list_transform(range(1, len(toks)-${n - 1}+1), i -> $gram)) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS s FROM t), " +
      s"bench AS (SELECT DISTINCT s FROM g WHERE doc_id % $benchMod = 0), " +
      "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, " +
      "CAST(count(bench.s) AS BIGINT) AS n_hit, " +
      "CAST(count(bench.s) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS contamination " +
      "FROM g LEFT JOIN bench ON g.s = bench.s GROUP BY doc_id) " +
      "SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams, " +
      "coalesce(n_hit, 0) AS n_hit, contamination " +
      "FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id ORDER BY d.doc_id"
  }

  /** Mirror of the q_funnel composition: gopher gate → exact-dedup
    * keepers → decontamination (bench grams from the FULL corpus, as
    * the Spark side passes them) → token-budget window over the
    * survivors, each stage re-derived from the prior one, reported as
    * per-stage survivor counts + token volumes. */
  def funnelSql(minWords: Int, maxWords: Int, minAvgLen: Double, maxAvgLen: Double,
                minStopHits: Int, minAlphaFrac: Double,
                n: Int, benchMod: Int, budget: Long): String = {
    val gram = (0 until n).map(o => s"toks[(i+$o)::INT]").mkString(" || ' ' || ")
    val grams = s"unnest(CASE WHEN len(toks) >= $n THEN " +
      s"list_distinct(list_transform(range(1, len(toks)-${n - 1}+1), i -> $gram)) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS s"
    def toklen(rel: String) =
      s"CAST(coalesce(sum(len(string_split(text, ' '))), 0) AS BIGINT) AS n_tokens FROM $rel"
    s"WITH gp AS (SELECT doc_id FROM (${gopherSql(minWords, maxWords, minAvgLen,
      maxAvgLen, minStopHits, minAlphaFrac)}) g WHERE passes), " +
      "s1 AS (SELECT d.* FROM documents d JOIN gp USING (doc_id)), " +
      "k AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY text), " +
      "s2 AS (SELECT s1.* FROM s1 JOIN k USING (doc_id)), " +
      "t2 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM s2), " +
      s"g2 AS (SELECT doc_id, $grams FROM t2), " +
      s"tb0 AS (SELECT string_split(text, ' ') AS toks FROM documents WHERE doc_id % $benchMod = 0), " +
      s"bg AS (SELECT DISTINCT s FROM (SELECT $grams FROM tb0)), " +
      "bad AS (SELECT DISTINCT doc_id FROM g2 JOIN bg USING (s)), " +
      "s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM bad)), " +
      "t3 AS (SELECT doc_id, source, " +
      "CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT) AS n_toks, " +
      s"coalesce(CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END, 0) AS fp " +
      "FROM s3), " +
      "c3 AS (SELECT doc_id, n_toks, sum(n_toks) OVER (PARTITION BY source " +
      "ORDER BY fp, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t3), " +
      s"s4 AS (SELECT doc_id, n_toks FROM c3 WHERE cum <= $budget) " +
      "SELECT * FROM (" +
      s"SELECT CAST(0 AS BIGINT) AS stage, 'all' AS name, count(*) AS n_docs, ${toklen("documents")} " +
      s"UNION ALL SELECT 1, 'quality', count(*), ${toklen("s1")} " +
      s"UNION ALL SELECT 2, 'dedup', count(*), ${toklen("s2")} " +
      s"UNION ALL SELECT 3, 'decontaminated', count(*), ${toklen("s3")} " +
      "UNION ALL SELECT 4, 'budgeted', count(*), " +
      "CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM s4" +
      ") ORDER BY stage"
  }

  /** Mirror of Dedup.substringPairs: same n-gram expansion, the same
    * df-cap pruning (so candidate sets match by construction), pair
    * counts over the surviving inverted index. */
  def substringPairsSql(n: Int, dfCap: Long): String = {
    val gram = (0 until n).map(o => s"toks[(i+$o)::INT]").mkString(" || ' ' || ")
    s"WITH t AS ($toksCte), " +
      s"gr AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= $n THEN " +
      s"list_distinct(list_transform(range(1, len(toks)-${n - 1}+1), i -> $gram)) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS g FROM t), " +
      s"keep AS (SELECT g FROM gr GROUP BY g HAVING count(*) >= 2 AND count(*) <= $dfCap), " +
      "k AS (SELECT doc_id, g FROM gr JOIN keep USING (g)) " +
      "SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS n_shared " +
      "FROM k a JOIN k b ON a.g = b.g AND a.doc_id < b.doc_id " +
      "GROUP BY 1, 2 ORDER BY da, db"
  }

  /** Mirror of Dedup.removeDuplicateSpans: positional word n-grams,
    * each gram's min doc_id keeps its copies, every token of a higher
    * doc covered by such a gram is dropped, documents reassembled from
    * surviving tokens in order. All integer/string arithmetic — bitwise.
    * The two zipped unnests in `tok` align element-for-element (DuckDB
    * zips same-SELECT unnests), giving the (tpos, tok) pairs Spark's
    * posexplode emits. */
  def spanRemovalSql(n: Int): String =
    s"WITH t AS ($toksCte), " +
      s"pg AS (SELECT doc_id, unnest(range(0, len(toks) - $n + 1)) AS p, toks " +
      s"FROM t WHERE len(toks) >= $n), " +
      s"gr AS (SELECT doc_id, p, " +
      s"array_to_string(list_slice(toks, (p+1)::INT, (p+$n)::INT), ' ') AS g FROM pg), " +
      "fd AS (SELECT g, min(doc_id) AS first_doc FROM gr GROUP BY g), " +
      "dropped AS (SELECT DISTINCT gr.doc_id, p + unnest(range(0, " + n + ")) AS tpos " +
      "FROM gr JOIN fd USING (g) WHERE fd.first_doc < gr.doc_id), " +
      "tok AS (SELECT doc_id, unnest(range(0, len(toks))) AS tpos, unnest(toks) AS tok " +
      "FROM t WHERE toks IS NOT NULL), " +
      "kept AS (SELECT doc_id, tpos, tok FROM tok " +
      "WHERE NOT EXISTS (SELECT 1 FROM dropped dr " +
      "WHERE dr.doc_id = tok.doc_id AND dr.tpos = tok.tpos)), " +
      "re AS (SELECT doc_id, count(*) AS n_kept, " +
      "string_agg(tok, ' ' ORDER BY tpos) AS text FROM kept GROUP BY doc_id), " +
      "tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t) " +
      "SELECT d0.doc_id, coalesce(n_tokens, 0) AS n_tokens, " +
      "coalesce(n_tokens, 0) - coalesce(n_kept, 0) AS n_dropped, " +
      "coalesce(re.text, '') AS text " +
      "FROM documents d0 LEFT JOIN tot ON d0.doc_id = tot.doc_id " +
      "LEFT JOIN re ON d0.doc_id = re.doc_id ORDER BY d0.doc_id"

  /** Mirror of Dedup.removeCorpusSpans over derived corpus/batch CTEs
    * (each a SELECT producing (doc_id, text)): the corpus's DISTINCT
    * n-grams own everything — every covered batch token drops. Same
    * positional-gram and reassembly SQL as [[spanRemovalSql]], with the
    * ownership test swapped from min-doc to corpus membership. */
  def spanRemovalIncrSql(n: Int, corpusCte: String, batchCte: String): String =
    s"WITH corpus AS ($corpusCte), batch AS ($batchCte), " +
      "ctk AS (SELECT string_split(text, ' ') AS toks FROM corpus), " +
      s"cpg AS (SELECT unnest(range(0, len(toks) - $n + 1)) AS p, toks " +
      s"FROM ctk WHERE len(toks) >= $n), " +
      s"cg AS (SELECT DISTINCT array_to_string(list_slice(toks, (p+1)::INT, (p+$n)::INT), ' ') AS g FROM cpg), " +
      "t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM batch), " +
      s"pg AS (SELECT doc_id, unnest(range(0, len(toks) - $n + 1)) AS p, toks " +
      s"FROM t WHERE len(toks) >= $n), " +
      s"gr AS (SELECT doc_id, p, " +
      s"array_to_string(list_slice(toks, (p+1)::INT, (p+$n)::INT), ' ') AS g FROM pg), " +
      "dropped AS (SELECT DISTINCT gr.doc_id, p + unnest(range(0, " + n + ")) AS tpos " +
      "FROM gr WHERE EXISTS (SELECT 1 FROM cg WHERE cg.g = gr.g)), " +
      "tok AS (SELECT doc_id, unnest(range(0, len(toks))) AS tpos, unnest(toks) AS tok " +
      "FROM t WHERE toks IS NOT NULL), " +
      "kept AS (SELECT doc_id, tpos, tok FROM tok " +
      "WHERE NOT EXISTS (SELECT 1 FROM dropped dr " +
      "WHERE dr.doc_id = tok.doc_id AND dr.tpos = tok.tpos)), " +
      "re AS (SELECT doc_id, count(*) AS n_kept, " +
      "string_agg(tok, ' ' ORDER BY tpos) AS text FROM kept GROUP BY doc_id), " +
      "tot AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t) " +
      "SELECT d0.doc_id, coalesce(n_tokens, 0) AS n_tokens, " +
      "coalesce(n_tokens, 0) - coalesce(n_kept, 0) AS n_dropped, " +
      "coalesce(re.text, '') AS text " +
      "FROM batch d0 LEFT JOIN tot ON d0.doc_id = tot.doc_id " +
      "LEFT JOIN re ON d0.doc_id = re.doc_id ORDER BY d0.doc_id"

  /** Mirror of Similarity.semDedup over the SAME cell-pruned pair set
    * as dedupEmbeddingSql: survivors = vectors that are nobody's
    * higher-id near-duplicate. */
  def semDedupSql(coarseIds: Seq[Long], threshold: Double): String =
    s"WITH dropped AS (SELECT DISTINCT vb AS vec_id FROM " +
      s"(${dedupEmbeddingSql(coarseIds, threshold)}) p) " +
      "SELECT vec_id FROM embeddings " +
      "WHERE vec_id NOT IN (SELECT vec_id FROM dropped) ORDER BY vec_id"

  /** Mirror of the q_retrieval composition: IVF top-k (annIvfSql,
    * identical parameters) joined back to the documents table on
    * doc_id = neighbor_id. */
  def retrievalSql(coarseIds: Seq[Long], queryIds: Seq[Long], nprobe: Int, k: Int): String =
    s"WITH topk AS (SELECT * FROM (${annIvfSql(coarseIds, queryIds, nprobe, k)}) t) " +
      "SELECT query_id, neighbor_id, sim, d.lang AS lang, d.source AS source, " +
      "d.n_chars AS n_chars FROM topk JOIN documents d ON d.doc_id = neighbor_id " +
      "ORDER BY query_id, neighbor_id"

  /** Mirror of TextAnalysis.bpeMergeStep: corpus-weighted adjacent
    * char-pair counts over the distinct-word table, top-k by
    * (count desc, pair). DuckDB range(a, b) is [a, b) — the same index
    * set as Spark's inclusive sequence(1, len-1). */
  def bpeMergeSql(k: Int): String =
    s"WITH t AS ($toksCte), " +
      "wv AS (SELECT w, count(*) AS wc FROM " +
      "(SELECT unnest(toks) AS w FROM t) u GROUP BY w), " +
      "p AS (SELECT wc, unnest(CASE WHEN len(w) >= 2 THEN " +
      "list_transform(range(1, len(w)), i -> substr(w, i::INT, 2)) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS pair FROM wv), " +
      "c AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM p GROUP BY pair), " +
      "r AS (SELECT *, CAST(row_number() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rn FROM c) " +
      s"SELECT pair, n, rn FROM r WHERE rn <= $k ORDER BY rn"

  /** Mirror of TextAnalysis.weightedSampleTopK: same fingerprint-
    * derived u, same −ln(u)/w clock, round-6 grid before ranking. */
  def weightedSampleSql(k: Int): String = {
    val m1 = (TextAnalysis.FpMod + 1).toDouble
    s"WITH t AS ($toksCte), " +
      "s AS (SELECT doc_id, CAST(len(toks) AS DOUBLE) AS w, " +
      s"CAST((CASE WHEN len(text) = 0 THEN 0 ELSE ${polyHashSql("text")} END) + 1 AS DOUBLE) / $m1 AS u " +
      "FROM t), " +
      "r AS (SELECT doc_id, round(-ln(u)/w, 6) AS skey FROM s), " +
      "rk AS (SELECT doc_id, skey, CAST(row_number() OVER (ORDER BY skey, doc_id) AS BIGINT) AS rn FROM r) " +
      s"SELECT doc_id, skey, rn FROM rk WHERE rn <= $k ORDER BY rn"
  }

  /** Mirror of Dedup.tfidfCosinePairs: same bigram occurrences, same
    * df-cap pruning, weights on the same round-4 grid, rounded-sim
    * threshold. */
  def tfidfCosineSql(threshold: Double, dfCap: Long): String =
    s"WITH t AS ($toksCte), " +
      "b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN " +
      "list_transform(range(1, len(toks)), i -> toks[i::INT] || ' ' || toks[(i+1)::INT]) " +
      "ELSE CAST([] AS VARCHAR[]) END) AS tm FROM t), " +
      "tf AS (SELECT doc_id, tm, count(*) AS tf FROM b GROUP BY 1, 2), " +
      s"dfq AS (SELECT tm, count(*) AS df FROM tf GROUP BY tm HAVING count(*) <= $dfCap), " +
      "nn AS (SELECT count(*) AS n FROM documents), " +
      // wl: round-4 grid weight scaled EXACTLY to BIGINT (mirrors the
      // Spark side); integer dot/norm sums are order-invariant, and the
      // 1e4 scale cancels in the cosine so no decimal factor appears
      "w AS MATERIALIZED (SELECT doc_id, tm, df, " +
      "CAST(round(round(tf * ln(n/df), 4) * 10000) AS BIGINT) AS wl " +
      "FROM tf JOIN dfq USING (tm) CROSS JOIN nn), " +
      // CAST(sum(..) AS BIGINT): DuckDB's sum(BIGINT) silently widens to
      // HUGEINT while Spark's ANSI sum(LONG) throws at 2^63 — without the
      // cast a near-boundary corpus fails only on the Spark side. The
      // HUGEINT→BIGINT cast throws on overflow, so BOTH engines now fail
      // loudly at the same threshold instead of the oracle "passing" on
      // a sum the Spark side can't even compute.
      "norms AS MATERIALIZED (SELECT doc_id, CAST(sum(wl*wl) AS BIGINT) AS n2l FROM w GROUP BY doc_id), " +
      "dots AS (SELECT a.doc_id AS da, b.doc_id AS db, CAST(sum(a.wl * b.wl) AS BIGINT) AS dotl " +
      "FROM w a JOIN w b ON a.tm = b.tm AND a.doc_id < b.doc_id " +
      "WHERE a.df >= 2 AND b.df >= 2 GROUP BY 1, 2) " +
      "SELECT da, db, round(CAST(dotl AS DOUBLE)/" +
      "(sqrt(CAST(na.n2l AS DOUBLE))*sqrt(CAST(nb.n2l AS DOUBLE))), 4) AS sim " +
      "FROM dots JOIN norms na ON da = na.doc_id JOIN norms nb ON db = nb.doc_id " +
      "WHERE na.n2l > 0 AND nb.n2l > 0 " +
      "AND round(CAST(dotl AS DOUBLE)/" +
      s"(sqrt(CAST(na.n2l AS DOUBLE))*sqrt(CAST(nb.n2l AS DOUBLE))), 4) >= $threshold " +
      "ORDER BY da, db"

  /** Mirror of the composite-lex DESCRIBE row (`q_lex_describe`): the
    * commit/maintenance columns are the 3-batch construction's
    * literals (the q_store_describe discipline), the row counts are
    * membership counts over `documents` — postings rows are distinct
    * (doc, token) pairs of the mirrored tokenizer, stats rows are
    * document counts, corpus constants the surviving (n, Σdl) — all
    * exact BIGINTs (DuckDB sums promote to HUGEINT, so every aggregate
    * CASTs back). `forgetIds` may contain ghosts: the pending-delete
    * backlog counts REQUESTS, the live counts subtract only ids the
    * corpus holds. */
  def lexDescribeSql(forgetIds: Seq[Long]): String = {
    val notIn = s"doc_id NOT IN (${forgetIds.mkString(", ")})"
    val pairsAll =
      "(SELECT CAST(count(*) AS BIGINT) FROM " +
        "(SELECT DISTINCT doc_id, unnest(toks) AS tok FROM t) pa)"
    val pairsLive =
      "(SELECT CAST(count(*) AS BIGINT) FROM " +
        s"(SELECT DISTINCT doc_id, unnest(toks) AS tok FROM t WHERE $notIn) pl)"
    val docsAll = "(SELECT CAST(count(*) AS BIGINT) FROM t)"
    val docsLive = s"(SELECT CAST(count(*) AS BIGINT) FROM t WHERE $notIn)"
    val sumdlLive =
      s"(SELECT CAST(sum(len(toks)) AS BIGINT) FROM t WHERE $notIn)"
    def row(stage: String, comp: String, gen: Long, cov: Long, parts: Long,
            liveB: Long, pend: Long, nCom: String, nLive: String) =
      s"SELECT '$stage' AS stage, '$comp' AS component, " +
        s"CAST($gen AS BIGINT) AS generation, " +
        s"CAST($cov AS BIGINT) AS covered_through, " +
        s"CAST($parts AS BIGINT) AS n_batch_parts, " +
        s"CAST($liveB AS BIGINT) AS n_live_batches, " +
        s"CAST($pend AS BIGINT) AS n_pending_delete_ids, " +
        s"$nCom AS n_committed, $nLive AS n_live, " +
        s"$docsLive AS corpus_n, $sumdlLive AS corpus_sumdl"
    s"WITH t AS ($toksCte) " +
      Seq(
        row("before", "postings", 0L, -1L, 3L, 3L, forgetIds.size.toLong,
          pairsAll, pairsLive),
        row("before", "stats", 0L, -1L, 3L, 3L, forgetIds.size.toLong,
          docsAll, docsLive),
        row("after", "postings", 1L, 2L, 1L, 0L, 0L, pairsLive, pairsLive),
        row("after", "stats", 1L, 2L, 1L, 0L, 0L, docsLive, docsLive))
        .mkString("", " UNION ALL ", " ") +
      "ORDER BY stage, component"
  }

  /** Mirror of TextAnalysis.bm25TopDocs: identical formula text (the
    * constants interpolate from the SAME Scala doubles, which
    * round-trip exactly through their decimal repr), identical
    * association order, score rounded to 4 before ranking. */
  /** `excludeIds` mirrors a deletion-vector probe: the excluded docs
    * leave the corpus entirely (tf, df, N and Σdl all shift — the
    * per-doc stats subtraction on the Spark side), not just the final
    * ranking. */
  def bm25Sql(queryTerms: Seq[String], k: Int, k1: Double, b: Double,
              excludeIds: Seq[Long] = Nil): String =
    bm25SqlFrom(toksCte, queryTerms, k, k1, b, excludeIds)

  /** [[bm25Sql]] over any (doc_id, toks) source CTE — the chunk-level
    * retrieval mirror reuses the whole scoring pipeline with RAG chunks
    * standing in for documents. */
  def bm25SqlFrom(sourceToksCte: String, queryTerms: Seq[String], k: Int,
                  k1: Double, b: Double,
                  excludeIds: Seq[Long] = Nil): String =
    bm25SqlOverTerms(sourceToksCte,
      s"SELECT unnest(${strList(queryTerms)}) AS term", k, k1, b, excludeIds)

  /** [[bm25SqlFrom]] with the query terms as a CTE instead of literals
    * (the bm25Over mirror) — a data-dependent term set (PRF expansion)
    * plugs in while literal callers compose to the identical text. */
  def bm25SqlOverTerms(sourceToksCte: String, termsCteSql: String, k: Int,
                       k1: Double, b: Double,
                       excludeIds: Seq[Long] = Nil): String = {
    val excl =
      if (excludeIds.isEmpty) ""
      else s" WHERE doc_id NOT IN (${excludeIds.mkString(", ")})"
    s"WITH t AS (SELECT * FROM ($sourceToksCte) t0$excl), " +
      "ex AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM t), " +
      s"q AS ($termsCteSql), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf, first(dl) AS dl " +
      "FROM ex JOIN q USING (term) GROUP BY doc_id, term), " +
      "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term), " +
      "st AS (SELECT count(*) AS n, CAST(sum(len(toks)) AS BIGINT) AS sumdl FROM t), " +
      // every integer leaf casts to DOUBLE before meeting a decimal
      // literal: DuckDB would otherwise run BIGINT*DECIMAL exactly
      // (tf*2.2 -> 6.6 exactly -> double 6.5999999999999996) while
      // Spark runs long*double (6.6000000000000005) — a pre-rounding
      // ulp divergence the round-4 grid cannot absorb at a boundary
      "sc AS (SELECT doc_id, round(sum(" +
      s"(ln((CAST(n - df AS DOUBLE) + 0.5)/(CAST(df AS DOUBLE) + 0.5) + 1.0) * " +
      s"(CAST(tf AS DOUBLE) * ${k1 + 1.0})) / " +
      s"(CAST(tf AS DOUBLE) + $k1 * (${1.0 - b} + $b * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE)/n))))" +
      "), 4) AS score FROM tf JOIN dfq USING (term) CROSS JOIN st GROUP BY doc_id), " +
      "r AS (SELECT doc_id, score, CAST(row_number() OVER " +
      "(ORDER BY score DESC, doc_id) AS BIGINT) AS rn FROM sc) " +
      s"SELECT doc_id, score, rn FROM r WHERE rn <= $k ORDER BY rn"
  }

  /** Mirror of TextAnalysis.prfExpansionTerms (RM3 expansion, equal-
    * weight variant): the seed ranking is the proven bm25Sql nested
    * whole, feedback term frequency counts only the top-fbDocs docs'
    * tokens, the df stoplist (`df < N` — only in-every-doc terms drop)
    * and the seed-term exclusion
    * are exact-integer predicates, selection by (w DESC, term) LIMIT —
    * a total order both engines share. DISTINCT applies to the
    * post-unnest rows (the spanRemovalSql zip pattern), so cdf counts
    * (doc, term) pairs exactly like Spark's array_distinct explode. */
  def prfTermsSql(seedTerms: Seq[String], fbDocs: Int, fbTerms: Int,
                  k1: Double, b: Double,
                  excludeIds: Seq[Long] = Nil): String = {
    val excl =
      if (excludeIds.isEmpty) ""
      else s" WHERE doc_id NOT IN (${excludeIds.mkString(", ")})"
    s"WITH fb AS (SELECT doc_id FROM (${bm25Sql(seedTerms, fbDocs, k1, b, excludeIds)}) f0), " +
      s"t AS (SELECT * FROM ($toksCte) tx$excl), " +
      "fex AS (SELECT unnest(t.toks) AS term FROM t JOIN fb USING (doc_id)), " +
      "ftf AS (SELECT term, CAST(count(*) AS BIGINT) AS ftf FROM fex GROUP BY term), " +
      "cdf AS (SELECT term, CAST(count(*) AS BIGINT) AS cdf FROM " +
      "(SELECT DISTINCT doc_id, unnest(toks) AS term FROM t) dt GROUP BY term), " +
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t) " +
      "SELECT term, ftf, (ftf * 1000000) // cdf AS w " +
      "FROM ftf JOIN cdf USING (term) CROSS JOIN nn " +
      s"WHERE cdf < n AND term NOT IN (SELECT unnest(${strList(seedTerms)})) " +
      s"ORDER BY w DESC, term LIMIT $fbTerms"
  }

  /** Mirror of TextAnalysis.bm25Prf: the term set is seeds UNION ALL
    * the prfTermsSql selection (disjoint by the exclusion predicate),
    * scored through the identical bm25 pipeline via the terms-CTE
    * variant. */
  def bm25PrfSql(seedTerms: Seq[String], fbDocs: Int, fbTerms: Int,
                 k: Int, k1: Double, b: Double,
                 excludeIds: Seq[Long] = Nil): String =
    bm25SqlOverTerms(toksCte,
      s"SELECT unnest(${strList(seedTerms)}) AS term " +
        "UNION ALL SELECT term FROM " +
        s"(${prfTermsSql(seedTerms, fbDocs, fbTerms, k1, b, excludeIds)}) px",
      k, k1, b, excludeIds)

  /** Mirror of Dedup.sourceStats fed by the MinHash near-dup pair set
    * (dedupMinhashSql, identical parameters): per-source duplication
    * report + blocklist bit. */
  /** Mirror of Dedup.crossSourceDupMatrix over the MinHash pair signal:
    * the dedup_minhash subquery, each pair joined to its endpoints'
    * sources, least/greatest-normalized, counted. */
  def dupMatrixSql(threshold: Double): String =
    s"WITH pairs AS (SELECT da, db FROM (${dedupMinhashSql(threshold)}) mp), " +
      "j AS (SELECT least(x.source, y.source) AS src_a, " +
      "greatest(x.source, y.source) AS src_b " +
      "FROM pairs JOIN documents x ON pairs.da = x.doc_id " +
      "JOIN documents y ON pairs.db = y.doc_id) " +
      "SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS n_pairs " +
      "FROM j GROUP BY src_a, src_b ORDER BY src_a, src_b"

  def sourceStatsSql(threshold: Double, maxDupFrac: Double): String =
    s"WITH pairs AS (SELECT da, db FROM (${dedupMinhashSql(threshold)}) mp), " +
      "ids AS (SELECT DISTINCT doc_id FROM " +
      "(SELECT da AS doc_id FROM pairs UNION ALL SELECT db AS doc_id FROM pairs) u), " +
      "j AS (SELECT d.source, d.doc_id, len(string_split(d.text, ' ')) AS nt, " +
      "CASE WHEN ids.doc_id IS NULL THEN 0 ELSE 1 END AS isdup " +
      "FROM documents d LEFT JOIN ids ON d.doc_id = ids.doc_id), " +
      "a AS (SELECT source, count(*) AS n_docs, CAST(sum(isdup) AS BIGINT) AS n_dup_docs, " +
      "CAST(sum(nt) AS BIGINT) AS n_tokens, min(doc_id) AS min_id FROM j GROUP BY source) " +
      "SELECT source, n_docs, n_dup_docs, n_tokens, min_id, " +
      "round(n_dup_docs/n_docs, 4) AS dup_frac, " +
      s"round(n_dup_docs/n_docs, 4) > $maxDupFrac AS blocked " +
      "FROM a ORDER BY source"
}
