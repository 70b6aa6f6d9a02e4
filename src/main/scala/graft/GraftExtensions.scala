package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.FulltextMatch

/** Session-extension entry point: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes the engine's SQL surface (currently `fulltext_match`) available in
  * every session of the application without touching application code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((FulltextMatch.identifier, FulltextMatch.info, FulltextMatch.builder))
}
