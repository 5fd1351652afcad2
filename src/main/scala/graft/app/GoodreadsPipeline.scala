package graft.app

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The reference's end-to-end curation pipeline (goodreads.py phase 1,
  * lines 33–152) re-expressed as composable engine calls — the "switch
  * your notebook to this library" surface. Inputs are the
  * Goodreads-shaped frames of FIXTURES.md §1; every step is one of the
  * operators in graft.operators/graft.queries, so the whole flow stays
  * a single Catalyst plan until the sink.
  *
  * Deliberate semantic repairs vs the notebook (SURVEY §7.5):
  *  - dedup-latest uses a window row_number (deterministic), not
  *    orderBy+dropDuplicates (goodreads.py:83, undefined ordering);
  *  - to_read sets are array_sort'ed (collect_set is unordered);
  *  - the genre argmax is native Catalyst (goodreads.py:54–57 was a
  *    Python UDF) with the same first-max-in-column-order tie-break.
  */
object GoodreadsPipeline {

  /** The ten genre-count fields of the UCSD genres JSON (FIXTURES §1.5,
    * ipynb cells 5–6), in struct order — the argmax tie-break order. */
  val genreFields: Seq[String] = Seq(
    "children", "comics, graphic", "fantasy, paranormal", "fiction",
    "history, historical fiction, biography", "mystery, thriller, crime",
    "non-fiction", "poetry", "romance", "young-adult")

  /** goodreads.py:45–57: star-expand the nested genre-count struct
    * (P1), fill nulls (P2), pick the dominant genre by argmax over the
    * count columns (P3). Genre names contain commas/hyphens, which the
    * attribute parser chokes on — expand through `getField` into safe
    * g_i columns, argmax over those, translate the winning label back.
    * Output: (book_id, genre). */
  def dominantGenre(genresRaw: DataFrame): DataFrame = {
    val expanded = genresRaw.select(
      col("book_id") +: genreFields.zipWithIndex.map { case (f, i) =>
        col("genres").getField(f).as(s"g_$i")
      }: _*).na.fill(0)
    val safe = genreFields.indices.map(i => s"g_$i")
    val backToName = map(genreFields.zipWithIndex.flatMap { case (f, i) =>
      Seq(lit(s"g_$i"), lit(f))
    }: _*)
    expanded
      .withColumn("genre", element_at(backToName, Relational.argmaxFields(safe)))
      .select("book_id", "genre")
  }

  /** goodreads.py:78–116: the curated books table.
    *
    * `booksSmall` = goodbooks-10k CSV (FIXTURES §1.3), `booksRaw` = the
    * UCSD JSON (§1.4, its `book_id` is the goodreads id), `genresRaw` =
    * §1.5. Steps: join enrich (J1/J2) → keep latest edition per work
    * (O1/O2, window form, ordered by the UCSD `publication_year`
    * exactly as goodreads.py:83) → English-only filter (P6, AFTER the
    * dedup as in goodreads.py:84 — a work whose latest edition is
    * non-English is dropped entirely, not replaced by an older English
    * edition) → authors split (P9) → id-space shift (P10) → casts
    * (P11). `publication_year` keeps its source type (string in the
    * UCSD JSON, so the ordering is the reference's lexicographic one);
    * it is consumed by the dedup and not selected into the output,
    * matching the reference's final column list. */
  def curateBooks(booksSmall: DataFrame, booksRaw: DataFrame,
      genresRaw: DataFrame, idOffset: Long = 100000L): DataFrame = {
    val ucsd = booksRaw.select(
      col("book_id").as("goodreads_book_id"),
      col("publication_year"),
      col("description"), col("popular_shelves"), col("similar_books"),
      col("num_pages"))
    val genre = dominantGenre(genresRaw)
      .withColumnRenamed("book_id", "goodreads_book_id")

    val joined = booksSmall
      .join(ucsd, Seq("goodreads_book_id"))                    // J1
      .join(genre, Seq("goodreads_book_id"), "left")           // J2

    Relational.dedupLatest(joined, Seq("work_id"),             // O1/O2
        Seq(col("publication_year").desc_nulls_last, col("book_id").asc))
      .filter(col("language_code").isin("en-US", "en-GB", "eng", "en-CA")) // P6
      .select(
        (col("book_id") + idOffset).cast("int").as("book_id"), // P10
        col("work_id").cast("int").as("work_id"),
        split(col("authors"), ", ").as("authors"),             // P9
        col("original_publication_year").cast("double"),
        col("title"),
        col("description"),
        col("popular_shelves"),
        col("genre"),
        col("num_pages").cast("int").as("num_pages"),          // P11
        col("similar_books"),
        col("average_rating").cast("double").as("average_rating"),
        col("work_ratings_count").cast("int").as("work_ratings_count"))
  }

  /** goodreads.py:94: per-user to-read sets (A3), deterministically
    * sorted. Output: (user_id, to_read array<int>). */
  def usersTable(toRead: DataFrame): DataFrame =
    Relational.collectSortedSet(toRead, "user_id", "book_id")
      .withColumnRenamed("book_id_set", "to_read")

  /** goodreads.py:151: ratings restricted to curated books (J3 semi). */
  def ratingsSmall(ratings: DataFrame, books: DataFrame, idOffset: Long = 100000L): DataFrame =
    Relational.semiRestrict(
      ratings.withColumn("book_id", col("book_id") + idOffset),
      books.select("book_id"), Seq("book_id"))

  /** goodreads.py:473–489: the property graph — vertices = users ∪
    * books (tagged union, U1/P12/O3), edges = (src=user, dst=book,
    * rating). Book ids are already offset by curateBooks. */
  def ratingsGraph(ratingsSmall: DataFrame, books: DataFrame): graft.graph.PropertyGraph = {
    val users = ratingsSmall.select(col("user_id").cast("long").as("id")).distinct()
      .withColumn("name", lit(null).cast("string"))
    val bookV = books.select(col("book_id").cast("long").as("id"),
      col("title").as("name"))
    val vertices = Relational.unionTagged(users, "User", bookV, "Book")
    val edges = ratingsSmall.select(
      col("user_id").cast("long").as("src"),
      col("book_id").cast("long").as("dst"),
      col("rating"))
    graft.graph.PropertyGraph(vertices, edges)
  }

  /** goodreads.py:145–146: point lookup (P7) — honest driver helper. */
  def getBookTitle(books: DataFrame, bookId: Long): Option[String] =
    books.filter(col("book_id") === bookId).select("title")
      .collect().headOption.map(_.getString(0))

  /** goodreads.py:289–294: a user's to-read list (driver helper over
    * the usersTable output). */
  def getToRead(users: DataFrame, userId: Long): Seq[Int] =
    users.filter(col("user_id") === userId).select("to_read")
      .collect().headOption.map(_.getSeq[Int](0)).getOrElse(Seq.empty)

  /** goodreads.py:375–381 / 453–459: nearest books to a given book's
    * feature vector via the fitted LSH model — the reference's
    * `find_nearest_books` as a library call. Returns (book_id, dist),
    * the key book excluded. */
  def findNearestBooks(
      model: org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel,
      featured: DataFrame, bookId: Long, n: Int,
      featuresCol: String = "features"): Seq[(Long, Double)] = {
    import org.apache.spark.ml.linalg.Vector
    featured.filter(col("book_id") === bookId)
      .select(featuresCol).collect().headOption match {
      case None => Seq.empty
      case Some(row) =>
        val key = row.getAs[Vector](0)
        model.approxNearestNeighbors(
            featured.filter(col("book_id") =!= bookId), key, n).toDF()
          .select(col("book_id").cast("long"), col("distCol"))
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
  }

  /** Typed view of the curated table (SURVEY §1.3's engine decision:
    * `Dataset[Book]` for the stable curated schema — column renames or
    * type drifts become compile/analysis errors, not wrong results). */
  def curateBooksTyped(booksSmall: DataFrame, booksRaw: DataFrame,
      genresRaw: DataFrame,
      idOffset: Long = 100000L): org.apache.spark.sql.Dataset[model.Book] = {
    val df = curateBooks(booksSmall, booksRaw, genresRaw, idOffset)
    import df.sparkSession.implicits._
    df.as[model.Book]
  }
}
