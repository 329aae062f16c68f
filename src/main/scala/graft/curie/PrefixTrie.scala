package graft.curie

import org.apache.spark.unsafe.types.UTF8String

/** Longest-prefix, case-insensitive CURIE/IRI prefix rewriter.
  *
  * Behavioural spec from the reference byte-trie
  * (`grebi_shared/src/prefix_map.rs:31-197`, used by
  * `01_ingest/grebi_normalise_prefixes/src/main.rs:33-74`):
  *   - match the LONGEST configured prefix of the input (18k-entry map in
  *     production, `prefix_maps/prefix_map_normalise.json`);
  *   - matching is case-insensitive, the replacement is emitted verbatim;
  *   - no match → input unchanged.
  *
  * Built once on the driver, broadcast inside the
  * [[graft.functions.NormalisePrefix]] codegen'd expression — a pure
  * map-side rewrite, no shuffle, scales linearly with input bytes.
  */
final class PrefixTrie private (root: PrefixTrie.Node) extends Serializable {

  /** Longest-prefix rewrite; returns the input instance unchanged on miss. */
  def rewrite(s: String): String = {
    var node = root
    var i = 0
    var lastEnd = -1
    var lastRepl: String = null
    val n = s.length
    while (node != null && i < n) {
      val c = s.charAt(i)
      val lc = if (c < 128) PrefixTrie.lower(c) else -1
      if (lc < 0) node = null
      else {
        node = node.children(lc)
        i += 1
        if (node != null && node.replacement != null) {
          lastEnd = i; lastRepl = node.replacement
        }
      }
    }
    if (lastRepl == null) s else lastRepl + s.substring(lastEnd)
  }

  /** UTF8String view for the codegen path: walks the Tungsten bytes
    * directly — the trie is ASCII-only, so any byte ≥ 0x80 (negative)
    * terminates matching exactly like the reference byte-trie, and the
    * dominant no-match path allocates NOTHING (no UTF-8→UTF-16 decode
    * per row). On a match, the consumed prefix is pure ASCII so its byte
    * length equals its char length, and the remainder bytes splice after
    * the replacement verbatim. */
  def rewriteUtf8(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var node = root
    var i = 0
    var lastEnd = -1
    var lastRepl: String = null
    while (node != null && i < n) {
      val b = s.getByte(i)
      if (b < 0) node = null
      else {
        node = node.children(PrefixTrie.lower(b.toChar))
        i += 1
        if (node != null && node.replacement != null) {
          lastEnd = i; lastRepl = node.replacement
        }
      }
    }
    if (lastRepl == null) s
    else {
      val repl = lastRepl.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val all = s.getBytes
      val out = new Array[Byte](repl.length + (n - lastEnd))
      System.arraycopy(repl, 0, out, 0, repl.length)
      System.arraycopy(all, lastEnd, out, repl.length, n - lastEnd)
      UTF8String.fromBytes(out)
    }
  }
}

object PrefixTrie {
  private[curie] final class Node extends Serializable {
    val children = new Array[Node](128)
    var replacement: String = null
  }

  private def lower(c: Char): Int =
    if (c >= 'A' && c <= 'Z') c + 32 else c

  def apply(map: Map[String, String]): PrefixTrie = {
    val root = new Node
    // deterministic tie-break: if two configured prefixes are
    // case-insensitively equal, the lexicographically largest key wins
    // (sorted insert ⇒ last write)
    map.toSeq.sortBy(_._1).foreach { case (prefix, repl) =>
      var node = root
      var ok = true
      prefix.foreach { c =>
        if (ok) {
          if (c >= 128) ok = false // non-ASCII prefixes unsupported, as in the reference byte-trie
          else {
            val lc = lower(c)
            if (node.children(lc) == null) node.children(lc) = new Node
            node = node.children(lc)
          }
        }
      }
      if (ok) node.replacement = repl
    }
    new PrefixTrie(root)
  }
}

/** Identifier scoring + sanity rules shared across the identity stage. */
object Ids {
  /** Canonical-id preference, exactly the reference `id_score`
    * (`02_assign_ids/grebi_identifiers2groups/src/main.rs:171-193`):
    * grebi:* → MIN, biolink:* → MIN+1000; otherwise −1000 when the id
    * contains ':' and is not http-prefixed (curie-like, IRIs excluded),
    * minus 1 per ASCII-alphabetic character (readable ids beat numeric).
    * Lower score wins; ties broken by the lexicographically smallest id
    * (the reference leaves ties to iteration order — here deterministic). */
  def idScore(id: String): Int =
    if (id.startsWith("grebi:")) Int.MinValue
    else if (id.startsWith("biolink:")) Int.MinValue + 1000
    else {
      var score = if (id.indexOf(':') >= 0 && !id.startsWith("http")) -1000 else 0
      var i = 0
      while (i < id.length) {
        val c = id.charAt(i)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) score -= 1
        i += 1
      }
      score
    }

  /** Pick the canonical id of a clique: min by (score, id), with the id
    * tie broken in UTF-8 BYTE order — the same comparison Catalyst's
    * min(struct(score, member)) uses in Groups.fromIdSets, so the Scala
    * and DataFrame paths pick identical canonicals even for ids with
    * supplementary characters (Java String order would invert those). */
  def canonical(ids: Iterable[String]): String =
    ids.reduceLeft { (a, b) =>
      val c = Integer.compare(idScore(a), idScore(b))
      if (c < 0 || (c == 0 && graft.core.Json.utf8Compare(a, b) <= 0)) a else b
    }

  /** Unprefixed all-numeric ids are ambiguous and dropped — UNLESS they
    * are 16+ chars, which the reference accepts as UUID-like
    * (`grebi_shared/src/lib.rs:10-23`). ASCII digits only, as there. */
  def isValidId(id: String): Boolean =
    id.nonEmpty && (id.length >= 16 || !id.forall(c => c >= '0' && c <= '9'))
}
