package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, filter, lower, split}

/** THE corpus tokenizer — one definition, one SQL twin. Every operator
  * that builds a vocabulary, shingle set, token count or packing budget
  * from `text` must use these (TextAnalysis, Dedup shingles, Curation
  * repetition/packing, Stats CMS): five independent inline copies existed
  * before this object, and a change to the token contract (e.g. adding
  * underscore or unicode classes) applied to one would silently fork the
  * token definition between operators that share one corpus vocabulary.
  *
  * Tokens are lower-cased alphanumeric runs; everything else separates.
  * Purely narrow Column work — no shuffle, stays in whole-stage codegen. */
object Text {
  val words: Column =
    filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
  val wordsSql: String =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), w -> w <> '')"
}
