package graft.app

/** Typed data model for the curated Goodreads tables (SURVEY §1.2–1.3):
  * case-class `Dataset[T]` views give compile-time column safety on the
  * stable curated schemas, while upstream raw/dynamic stages stay
  * `DataFrame`s. Nullable columns are `Option`s — absence is a type,
  * not a runtime surprise. */
object model {

  /** One `popular_shelves` element (counts arrive as strings in the
    * UCSD JSON — preserved, parity with ipynb cell 17). */
  final case class Shelf(count: String, name: String)

  /** Curated book row (schema of ipynb cell 18 / FIXTURES §1.6). */
  final case class Book(
      book_id: Int,
      work_id: Int,
      authors: Seq[String],
      original_publication_year: Option[Double],
      title: String,
      description: Option[String],
      popular_shelves: Seq[Shelf],
      genre: Option[String],
      num_pages: Option[Int],
      similar_books: Seq[String],
      average_rating: Option[Double],
      work_ratings_count: Option[Int])

  final case class Rating(user_id: Int, book_id: Long, rating: Int)

  final case class UserToRead(user_id: Int, to_read: Seq[Int])
}
