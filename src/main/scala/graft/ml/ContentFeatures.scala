package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature._
import org.apache.spark.sql.DataFrame

/** Feature-engineering chains from the reference (M6–M10, M15,
  * M17–M19; goodreads.py:315–335, 388–390, 421–429), as composable
  * fit-and-transform helpers. All spark.ml built-ins — the Python API
  * the reference used is a thin wrapper over these same classes.
  */
object ContentFeatures {

  /** M6–M9 (goodreads.py:315–327): text → tokens → stopword-filtered →
    * hashed TF → IDF. Output column: "tfidf". The reference's
    * numFeatures=20 is reproducible via the parameter. */
  def tfidf(df: DataFrame, textCol: String, numFeatures: Int = 20): DataFrame = {
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol(textCol).setOutputCol("__words"),
      new StopWordsRemover().setInputCol("__words").setOutputCol("__filtered"),
      new HashingTF().setInputCol("__filtered").setOutputCol("__tf")
        .setNumFeatures(numFeatures),
      new IDF().setInputCol("__tf").setOutputCol("tfidf")))
    pipe.fit(df).transform(df).drop("__words", "__filtered", "__tf")
  }

  /** M10 (goodreads.py:331–335): PCA projection to k dims. */
  def pca(df: DataFrame, inputCol: String, k: Int, outputCol: String = "pca"): DataFrame =
    new PCA().setInputCol(inputCol).setOutputCol(outputCol).setK(k)
      .fit(df).transform(df)

  /** M15 (goodreads.py:388–390): vocabulary-based term counts (LDA
    * input). Output column: "counts". */
  def countVectors(df: DataFrame, textCol: String, vocabSize: Int = 1000,
      minDF: Double = 1.0): DataFrame = {
    val pipe = new Pipeline().setStages(Array(
      new Tokenizer().setInputCol(textCol).setOutputCol("__words"),
      new StopWordsRemover().setInputCol("__words").setOutputCol("__filtered"),
      new CountVectorizer().setInputCol("__filtered").setOutputCol("counts")
        .setVocabSize(vocabSize).setMinDF(minDF)))
    pipe.fit(df).transform(df).drop("__words", "__filtered")
  }

  /** M17–M19 (goodreads.py:421–429): categorical columns →
    * StringIndexer (handleInvalid=skip, matching the reference) +
    * numeric columns → assembled "features" vector. */
  def metadataFeatures(df: DataFrame, catCols: Seq[String],
      numCols: Seq[String]): DataFrame = {
    // P16 (goodreads.py:423): drop rows with nulls in any feature input
    val clean = df.na.drop((catCols ++ numCols).toSeq)
    val indexers = catCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("skip"))
    val assembler = new VectorAssembler()
      .setInputCols((catCols.map(_ + "_idx") ++ numCols).toArray)
      .setOutputCol("features")
    new Pipeline().setStages((indexers :+ assembler).toArray)
      .fit(clean).transform(clean)
  }
}
