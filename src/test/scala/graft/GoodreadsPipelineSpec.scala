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
      (14, 4, 300, "Dee D", 2015.0, "Gamma", "en-GB", 4.8, 300))
      .toDF("book_id", "goodreads_book_id", "work_id", "authors",
        "original_publication_year", "title", "language_code",
        "average_rating", "work_ratings_count")
  }

  private lazy val booksRaw = {
    import spark.implicits._
    Seq(
      ("1", "desc alpha2", "320"), ("2", "desc alpha1", "250"),
      ("3", "desc beta", "100"), ("4", "desc gamma", "500"))
      .toDF("book_id", "description", "num_pages")
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

  test("curateBooks: English filter + dedup-latest + id offset + authors split") {
    val rows = curated.collect()
    // work 100 keeps the 2001 edition; French Beta dropped; Gamma kept
    assert(rows.length === 2)
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
