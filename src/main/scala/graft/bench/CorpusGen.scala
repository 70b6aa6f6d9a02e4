package graft.bench

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.index.SourceFile

/** Deterministic synthetic source-code corpus (FIXTURES.md §1).
  *
  * Row i's content is a pure function of (seed, i) — independent of
  * partitioning — so `local[8]` and `local[32]` generate the identical
  * corpus, which the scaling-efficiency benchmark requires. Vocabulary
  * mirrors real code statistics: ~50 Zipf-hot keywords (the skewed terms),
  * ~20k long-tail identifiers, mixed case, digits, and non-ASCII comments to
  * exercise Unicode tokenizer parity.
  */
object CorpusGen {

  val keywords: Array[String] = Array(
    "def", "val", "var", "return", "if", "else", "while", "for", "match",
    "case", "class", "object", "trait", "extends", "import", "package",
    "public", "private", "static", "void", "int", "string", "bool", "float",
    "let", "mut", "fn", "impl", "struct", "enum", "use", "mod", "pub",
    "error", "result", "option", "some", "none", "null", "true", "false",
    "index", "query", "parse", "token", "buffer", "stream", "write", "read",
    "handle", "new")

  val langs: Array[String] = Array("scala", "java", "rust", "py", "c")

  private val identStyles = Array("parser", "handler", "writer", "reader",
    "codec", "merge", "scorer", "field", "block", "segment", "term", "doc")

  private def identifier(rng: java.util.Random): String = {
    val style = rng.nextInt(3)
    val base = identStyles(rng.nextInt(identStyles.length))
    val n = rng.nextInt(20000)
    style match {
      case 0 => f"${base}_${n % 100}%02d"
      case 1 => s"$base${('A' + rng.nextInt(26)).toChar}${n % 1000}"
      case 2 => s"${base}Impl$n"
    }
  }

  /** Zipf-ish keyword pick: low indices much more frequent. */
  private def keyword(rng: java.util.Random): String = {
    val u = rng.nextDouble()
    keywords((u * u * u * keywords.length).toInt.min(keywords.length - 1))
  }

  def contentFor(seed: Long, i: Long, avgLines: Int): String = {
    val rng = new java.util.Random(seed * 1000003L + i)
    val lines = 4 + rng.nextInt(2 * avgLines.max(3))
    val sb = new StringBuilder
    var l = 0
    while (l < lines) {
      rng.nextInt(10) match {
        case 0 => sb.append(s"// ${keyword(rng)} über-fast ПОИСК ${identifier(rng)}\n")
        case 1 => sb.append(s"${keyword(rng)} ${identifier(rng)} = ${identifier(rng)}(${rng.nextInt(100)});\n")
        case 2 => sb.append(s"${keyword(rng)} ${keyword(rng)} { ${identifier(rng)}.${identifier(rng)}() }\n")
        case _ =>
          val words = 3 + rng.nextInt(8)
          val ws = (0 until words).map(_ => if (rng.nextInt(3) == 0) keyword(rng) else identifier(rng))
          sb.append(ws.mkString(" ")).append('\n')
      }
      l += 1
    }
    sb.toString
  }

  def row(seed: Long, i: Long, avgLines: Int = 20): SourceFile = {
    val rng = new java.util.Random(seed * 7776151L + i)
    val repo = f"org${rng.nextInt(97)}%04d/proj${rng.nextInt(31)}%02d"
    val path = s"src/d${rng.nextInt(40)}/file_$i.${langs(rng.nextInt(langs.length))}"
    val commit = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.digest(repo.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(40)
    }
    val lang = langs(rng.nextInt(langs.length))
    SourceFile(repo, path, commit, lang, contentFor(seed, i, avgLines))
  }

  def corpus(spark: SparkSession, n: Long, seed: Long = 42L,
             avgLines: Int = 20, partitions: Int = 0): Dataset[SourceFile] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions) else spark.range(n)
    base.map(i => row(seed, i, avgLines))
  }
}
