package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Byte-pair-encoding primitives (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") shared by the trainer
  * ([[graft.operators.BpeTrainer]]) and the encode queries.
  *
  * Token sequences are represented as ONE bracketed string instead of an
  * array: every symbol is wrapped in `\u0001` brackets
  * (`hello` → `␁h␁␁e␁␁l␁␁l␁␁o␁␁␂␁`, `\u0002` = end-of-word marker), so
  * applying a merge (l, r) → lr is a single literal
  * `replace("␁l␁␁r␁" → "␁lr␁")` — a codegen'd built-in whose
  * left-to-right non-overlapping scan IS canonical BPE's greedy
  * left-to-right merge order (`aaaa` + (a,a) → `aa aa`, not `aa a a`).
  * The same replace chain runs verbatim in DuckDB (`replace`), making
  * fixed-merge encoding hash-exact cross-engine; no per-row array
  * building, no UDF.
  *
  * Brackets never collide with text: [[sanitize]] strips all ASCII
  * control chars (identically expressible in DuckDB) before wrapping.
  * Because every word ends with the marker token and no learned merge
  * has a marker-final LEFT side (within a word the marker is always
  * final, so such a pair never occurs in training data), whole documents
  * can be encoded as one concatenated bracket string — merges cannot
  * cross word boundaries.
  */
object Bpe {

  /** Symbol bracket char — delimits tokens in the wrapped form. */
  val B = "\u0001"

  /** End-of-word marker symbol (rendered `</w>` in output). */
  val W = "\u0002"

  /** Strip ASCII control chars (incl. the bracket/marker chars, \r\n\t).
    * Character-class regex — byte-identical semantics in Java regex and
    * RE2/DuckDB (`.`-based patterns differ on \r between the two
    * engines; a class does not).
    */
  def sanitize(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x1F\\x7F]", "")

  /** One word → wrapped symbol string: each char bracketed, end-of-word
    * marker appended as its own symbol. `[\s\S]`, not `.`: Java's dot
    * also excludes U+0085/U+2028/U+2029 while RE2's excludes only \n —
    * the class matches every char identically in both engines.
    */
  def wrapWord(word: Column): Column =
    concat(regexp_replace(word, "([\\s\\S])", B + "$1" + B), lit(B + W + B))

  /** Whole sanitized text → one wrapped symbol string (words
    * concatenated; the per-word markers keep merges word-local).
    * Empty words from repeated spaces are dropped on both engines.
    */
  def wrapText(text: Column): Column =
    concat_ws("", transform(
      filter(split(sanitize(text), " "), w => w =!= ""),
      w => wrapWord(w)))

  /** Apply merges in rank order — canonical BPE encoding. Each merge is
    * one literal replace over the wrapped string; a chain of N merges
    * stays inside whole-stage codegen (Catalyst splits oversized
    * generated methods automatically).
    */
  def applyMerges(wrapped: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(wrapped) { case (c, (l, r)) =>
      replace(c, lit(B + l + B + B + r + B), lit(B + l + r + B))
    }

  /** Token count of a wrapped string: brackets/2. Exact integer — both
    * engines compute (len - len(without brackets)) / 2 on even values.
    */
  def nTokens(wrapped: Column): Column =
    ((length(wrapped) - length(replace(wrapped, lit(B), lit("")))) / 2)
      .cast("int")

  /** Wrapped string → human-readable token stream: symbols joined by
    * single spaces, marker rendered as the conventional `</w>`.
    */
  def render(wrapped: Column): Column =
    replace(
      concat_ws(" ", split(trim(wrapped, B), B + B)),
      lit(W), lit("</w>"))

  /** Render one symbol (e.g. a merge side) for display. */
  def renderSym(sym: Column): Column = replace(sym, lit(W), lit("</w>"))

  /** Fixed demonstration merge list for the oracle-gated encode query:
    * frequent-English pairs in a plausible learned order (incl. two
    * marker merges). Deterministic and engine-independent — the oracle
    * replays the identical replace chain in DuckDB.
    */
  val FixedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("the", W), ("i", "n"), ("a", "n"),
    ("an", "d"), ("and", W), ("e", "r"), ("o", "n"), ("r", "e"),
    ("e", W), ("s", W))

  /** The [[FixedMerges]] replace chain as DuckDB SQL applied to
    * expression `e` — used to build the oracle query string.
    */
  def fixedMergesDuckSql(e: String): String = mergesDuckSql(FixedMerges, e)

  /** Any merge list's replace chain as DuckDB SQL — the generic
    * [[applyMerges]] replay (code-point and byte alphabets alike: the
    * bracketed form doesn't care what a symbol is made of).
    */
  def mergesDuckSql(merges: Seq[(String, String)], e: String): String =
    merges.foldLeft(e) { case (acc, (l, r)) =>
      s"replace($acc, ${duckSym(l)}||${duckSym(r)}, ${duckSym(l + r)})"
    }

  // ---- TX-BPE3: byte-level alphabet (the GPT-2 byte-fallback model) ----

  /** One word → wrapped BYTE-symbol string: the word's UTF-8 bytes,
    * each rendered as its UPPERCASE two-hex-digit symbol and
    * bracketed, marker appended. The 256-symbol base alphabet covers
    * every possible input, so byte-level BPE can never hit OOV — the
    * byte-fallback property production tokenizers (GPT-2/LLaMA) rely
    * on; a multi-byte code point simply starts as several byte symbols
    * that merges may (or may not) rejoin. Spark `hex(encode(w))` and
    * DuckDB `hex(encode(w))` both emit uppercase hex, so the wrap, the
    * merge chain and the render replay identically cross-engine.
    */
  def wrapWordBytes(word: Column): Column =
    concat(regexp_replace(hex(encode(word, "UTF-8")),
      "([0-9A-F]{2})", B + "$1" + B), lit(B + W + B))

  /** Whole sanitized text → one wrapped byte-symbol string (the
    * byte-level [[wrapText]]).
    */
  def wrapTextBytes(text: Column): Column =
    concat_ws("", transform(
      filter(split(sanitize(text), " "), w => w =!= ""),
      w => wrapWordBytes(w)))

  /** Fixed byte-level demonstration merges — [[FixedMerges]]' pairs
    * spelled in UTF-8 hex ('t'=74 'h'=68 'e'=65 'i'=69 'n'=6E 'a'=61
    * 'd'=64 'r'=72 'o'=6F 's'=73), same plausible learned order.
    */
  val FixedByteMerges: Seq[(String, String)] = Seq(
    ("74", "68"), ("7468", "65"), ("746865", W), ("69", "6E"),
    ("61", "6E"), ("616E", "64"), ("616E64", W), ("65", "72"),
    ("6F", "6E"), ("72", "65"), ("65", W), ("73", W))

  /** A symbol as a DuckDB bracketed-literal expression (`chr(1)` spliced
    * around/inside printable chars; the marker is `chr(2)`).
    */
  private def duckSym(s: String): String = {
    val body = s.flatMap {
      case '\u0002' => "'||chr(2)||'"
      case '\''     => "''"
      case c        => c.toString
    }
    s"(chr(1)||'$body'||chr(1))"
  }
}
