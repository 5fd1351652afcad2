package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.app.GoodreadsPipeline

/** End-to-end curation pipeline on Goodreads-shaped miniatures
  * (FIXTURES.md §1): genre argmax with the reference's tie-break,
  * English filter, dedup-latest, id offset, sorted to-read sets,
  * ratings restriction, graph construction, lookup helper. */
class GoodreadsPipelineSpec extends SparkSpec {

  private lazy val genresRaw = {
    val genreStruct = StructType(GoodreadsPipeline.genreFields.map(f =>
      StructField(f, LongType, nullable = true)))
    val schema = StructType(Seq(
      StructField("book_id", StringType), StructField("genres", genreStruct)))
    def g(vals: (Int, Long)*): Row = {
      val arr = Array.fill[Any](10)(null)
      vals.foreach { case (i, v) => arr(i) = v }
      Row.fromSeq(arr.toSeq)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("1", g(3 -> 10L, 8 -> 4L)),          // fiction dominates
        Row("2", g(0 -> 7L, 9 -> 7L)),           // tie children/young-adult → children (first)
        Row("3", g()),                           // all null → all 0 → first field
        Row("4", g(6 -> 2L))),                   // non-fiction (hyphenated name)
      schema)
  }

  private lazy val booksSmall = {
    import spark.implicits._
    // (book_id, goodreads_book_id, work_id, authors, original_publication_year,
    //  title, language_code, average_rating, work_ratings_count)
    Seq(
      (11, 1, 100, "Ann A, Bob B", 2001.0, "Alpha 2nd ed", "eng", 4.1, 100),
      (12, 2, 100, "Ann A", 1999.0, "Alpha 1st ed", "en-US", 4.0, 90),
      (13, 3, 200, "Cy C", 2010.0, "Beta", "fre", 3.5, 50),
      (14, 4, 300, "Dee D", 2015.0, "Gamma", "en-GB", 4.8, 300),
      // work 400: the LATEST edition is French — the reference dedups
      // FIRST, then language-filters, so the whole work disappears
      (15, 5, 400, "Eve E", 2020.0, "Delta (fr)", "fre", 3.9, 70),
      (16, 6, 400, "Eve E", 2010.0, "Delta (en)", "eng", 4.0, 80))
      .toDF("book_id", "goodreads_book_id", "work_id", "authors",
        "original_publication_year", "title", "language_code",
        "average_rating", "work_ratings_count")
  }

  private lazy val booksRaw = {
    import spark.implicits._
    // UCSD JSON: all scalars are STRINGS (FIXTURES §1.4), including
    // publication_year — the dedup ordering column (goodreads.py:83)
    Seq(
      ("1", "2001", "desc alpha2", "320"), ("2", "1999", "desc alpha1", "250"),
      ("3", "2010", "desc beta", "100"), ("4", "2015", "desc gamma", "500"),
      ("5", "2020", "desc delta fr", "410"), ("6", "2010", "desc delta en", "400"))
      .toDF("book_id", "publication_year", "description", "num_pages")
      .withColumn("popular_shelves",
        array(struct(lit("3").as("count"), lit("to-read").as("name"))))
      .withColumn("similar_books", array(lit("9"), lit("8")))
  }

  private lazy val curated =
    GoodreadsPipeline.curateBooks(booksSmall, booksRaw, genresRaw)

  test("dominantGenre: argmax with first-max tie-break over messy field names") {
    import spark.implicits._
    val got = GoodreadsPipeline.dominantGenre(genresRaw)
      .as[(String, String)].collect().toMap
    assert(got === Map(
      "1" -> "fiction",
      "2" -> "children",            // tie → first in struct order
      "3" -> "children",            // all-zero → first field
      "4" -> "non-fiction"))
  }

  test("curateBooks: dedup-latest THEN English filter + id offset + authors split") {
    val rows = curated.collect()
    // work 100 keeps the 2001 edition; French Beta dropped; Gamma kept;
    // work 400 dropped ENTIRELY (latest edition is French — reference
    // order: dedup first, goodreads.py:83, then language, :84)
    assert(rows.length === 2)
    assert(!rows.map(_.getAs[String]("title")).exists(_.startsWith("Delta")))
    val byTitle = rows.map(r => r.getAs[String]("title") -> r).toMap
    assert(byTitle.contains("Alpha 2nd ed") && byTitle.contains("Gamma"))
    val alpha = byTitle("Alpha 2nd ed")
    assert(alpha.getAs[Int]("book_id") === 100011)
    assert(alpha.getAs[Seq[String]]("authors") === Seq("Ann A", "Bob B"))
    assert(alpha.getAs[Int]("num_pages") === 320)
    assert(alpha.getAs[String]("genre") === "fiction")
    // schema parity with SURVEY §1.2 (names + order)
    assert(curated.columns.toSeq === Seq("book_id", "work_id", "authors",
      "original_publication_year", "title", "description", "popular_shelves",
      "genre", "num_pages", "similar_books", "average_rating",
      "work_ratings_count"))
  }

  test("curateBooksTyped round-trips through the Book case class") {
    val typed = GoodreadsPipeline.curateBooksTyped(booksSmall, booksRaw, genresRaw)
      .collect().sortBy(_.book_id)
    assert(typed.map(_.title).toSeq === Seq("Alpha 2nd ed", "Gamma"))
    val alpha = typed.head
    assert(alpha.book_id === 100011)
    assert(alpha.authors === Seq("Ann A", "Bob B"))
    assert(alpha.genre === Some("fiction"))
    assert(alpha.popular_shelves.head ===
      graft.app.model.Shelf("3", "to-read"))
  }

  test("usersTable: sorted deterministic to_read sets; getToRead lookup") {
    import spark.implicits._
    val toRead = Seq((1, 5), (1, 3), (1, 5), (2, 9)).toDF("user_id", "book_id")
    val users = GoodreadsPipeline.usersTable(toRead)
    val got = users.as[(Int, Seq[Int])].collect().toMap
    assert(got === Map(1 -> Seq(3, 5), 2 -> Seq(9)))
    assert(GoodreadsPipeline.getToRead(users, 1L) === Seq(3, 5))
    assert(GoodreadsPipeline.getToRead(users, 42L) === Seq.empty)
  }

  test("findNearestBooks returns n nearest by LSH, key excluded") {
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val featured = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0.1f, 0f)),
      (3L, Array(5f, 5f)), (4L, Array(0.2f, 0.1f)))
      .toDF("book_id", "emb")
      .withColumn("features", array_to_vector(col("emb")))
    val model = graft.ml.VectorSearch.brpLsh(featured, "features",
      bucketLength = 10.0, numHashTables = 4, seed = 1L)
    val nn = GoodreadsPipeline.findNearestBooks(model, featured, 1L, 2)
    assert(nn.map(_._1).toSet === Set(2L, 4L))
    assert(GoodreadsPipeline.findNearestBooks(model, featured, 99L, 2) === Seq.empty)
  }

  test("scaled Goodreads-shaped fixture: structural goldens hold at 10k books / 100k ratings") {
    import spark.implicits._
    // deterministic 10k-book / 5k-work fixture (2 editions per work),
    // FIXTURES §1.3/§1.4 shapes — the proportional analog of the
    // notebook's 10k→8 723 curation (goodreads.py:86): every golden
    // below is recomputed INDEPENDENTLY in plain Scala first.
    val nBooks = 10000
    val langs = Array("eng", "en-US", "fre", "ger", "en-GB",
      "spa", "eng", "en-CA", "ita", "eng")
    val english = Set("en-US", "en-GB", "eng", "en-CA")
    def py(b: Int) = (1990 + (b * 7) % 30).toString
    def lang(b: Int) = langs(b % 10)

    val booksSmallBig = (1 to nBooks).map(b => (b, b, (b + 1) / 2,
        "Auth A, Auth B", 1900.0 + b % 100, s"Book $b", lang(b),
        3.0 + (b % 20) / 10.0, b % 1000))
      .toDF("book_id", "goodreads_book_id", "work_id", "authors",
        "original_publication_year", "title", "language_code",
        "average_rating", "work_ratings_count")
    val booksRawBig = (1 to nBooks).map(b => (b.toString, py(b),
        s"desc $b", (100 + b % 400).toString))
      .toDF("book_id", "publication_year", "description", "num_pages")
      .withColumn("popular_shelves",
        array(struct(lit("3").as("count"), lit("to-read").as("name"))))
      .withColumn("similar_books", array(lit("9")))
    val genresBig = (1 to nBooks by 3).map(b => (b.toString, b % 10)).toDF("book_id", "gi")
      .select(col("book_id"), struct(GoodreadsPipeline.genreFields.zipWithIndex.map {
        case (f, i) => when(col("gi") === i, 5L).otherwise(lit(null)).as(f)
      }: _*).as("genres"))

    // independent plain-Scala oracle: latest publication_year per work
    // (string desc, book_id asc tie-break), THEN the English filter
    val kept = (1 to nBooks / 2).flatMap { w =>
      val eds = Seq(2 * w - 1, 2 * w)
      val winner = eds.maxBy(b => (py(b), -b))
      if (english(lang(winner))) Some(winner) else None
    }

    val curatedBig = GoodreadsPipeline.curateBooks(booksSmallBig, booksRawBig, genresBig)
    assert(curatedBig.count() === kept.size)
    // ~60% of works should survive (6/10 langs are English): the
    // notebook's 87% analog — a real ratio, not 100%
    assert(kept.size > 2000 && kept.size < nBooks / 2)
    assert(curatedBig.select(countDistinct("work_id")).head().getLong(0) === kept.size)
    // id shift: min curated book_id = 100000 + min surviving raw id
    // (the notebook's `min(book_id)` print, goodreads.py:107)
    assert(curatedBig.agg(min("book_id")).head().getInt(0) === 100000 + kept.min)
    // schema golden (ipynb cell 18): names, order, key types
    assert(curatedBig.columns.toSeq === Seq("book_id", "work_id", "authors",
      "original_publication_year", "title", "description", "popular_shelves",
      "genre", "num_pages", "similar_books", "average_rating",
      "work_ratings_count"))
    val dt = curatedBig.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(dt("book_id") === "int" && dt("authors") === "array<string>" &&
      dt("num_pages") === "int" && dt("original_publication_year") === "double")

    // 100k ratings; restriction must keep exactly those on kept books
    val keptSet = kept.toSet
    val ratingsBig = spark.range(0, 100000).select(
      (col("id") % 5000 + 1).cast("int").as("user_id"),
      ((col("id") * 31) % nBooks + 1).cast("int").as("book_id"),
      (col("id") % 5 + 1).cast("int").as("rating"))
    val expectedRatings = (0L until 100000L)
      .count(r => keptSet.contains(((r * 31) % nBooks + 1).toInt))
    val rs = GoodreadsPipeline.ratingsSmall(ratingsBig, curatedBig)
    assert(rs.count() === expectedRatings)
    // graph partitions: user ids < 100000 <= shifted book ids — disjoint
    val gBig = GoodreadsPipeline.ratingsGraph(rs, curatedBig)
    val maxUser = gBig.edges.agg(max("src")).head().getLong(0)
    val minBook = gBig.edges.agg(min("dst")).head().getLong(0)
    assert(maxUser < 100000L && minBook >= 100000L)
  }

  test("ratingsSmall restricts to curated books; graph shapes up") {
    import spark.implicits._
    val ratings = Seq((7, 11, 5), (7, 13, 3), (8, 14, 4))
      .toDF("user_id", "book_id", "rating")
    val rs = GoodreadsPipeline.ratingsSmall(ratings, curated)
    // book 13 (French) was dropped in curation → its rating vanishes
    assert(rs.count() === 2)
    assert(rs.agg(min("book_id")).head().getLong(0) >= 100000L)

    val g = GoodreadsPipeline.ratingsGraph(rs, curated)
    assert(g.edges.count() === 2)
    val types = g.vertices.groupBy("type").count()
      .as[(String, Long)].collect().toMap
    assert(types("User") === 2 && types("Book") === 2)
    assert(GoodreadsPipeline.getBookTitle(curated, 100014L) === Some("Gamma"))
    assert(GoodreadsPipeline.getBookTitle(curated, 42L) === None)
  }
}
