package graft.core

import scala.collection.mutable

/** Character trie mapping string prefixes to values, with longest-prefix
  * lookup — used to shorten URLs to `ns:`-form given a prefix table.
  * Behavioral contract from the reference (util/StringTrie.scala:7-117 and
  * its test StringTrie$Test.scala:12-104): longest registered prefix wins;
  * strings matching no registered prefix (including strict prefixes of a
  * registered prefix) yield null; `compress()` (path compression) must not
  * change lookup results.
  *
  * Implementation is a fresh path-compressed radix tree, not a port.
  */
final class StringTrie[V >: Null <: AnyRef] extends Serializable {

  private final class Node extends Serializable {
    // Edge label fragment leading INTO this node (post-compression it can be
    // multi-char; pre-compression always length 1 except the root's "").
    var fragment: String = ""
    var value: V = null
    val children: mutable.SortedMap[Char, Node] = mutable.SortedMap.empty
  }

  private val root = new Node

  def put(key: String, value: V): Unit = {
    var node = root
    var i = 0
    while (i < key.length) {
      val ch = key.charAt(i)
      // Walk/create matching the existing fragment structure.
      node.children.get(ch) match {
        case Some(child) =>
          val frag = child.fragment
          val maxCommon = math.min(frag.length, key.length - i)
          var k = 0
          while (k < maxCommon && frag.charAt(k) == key.charAt(i + k)) k += 1
          if (k == frag.length) {
            node = child
            i += k
          } else {
            // Split the edge at the divergence point.
            val mid = new Node
            mid.fragment = frag.substring(0, k)
            child.fragment = frag.substring(k)
            node.children.update(ch, mid)
            mid.children.update(child.fragment.charAt(0), child)
            node = mid
            i += k
          }
        case None =>
          val leaf = new Node
          leaf.fragment = key.substring(i)
          node.children.update(ch, leaf)
          leaf.value = value
          return
      }
    }
    node.value = value
  }

  /** Value of the longest registered prefix of `s`, or null. */
  def longestPrefixValue(s: String): V = {
    var best: V = null
    var node = root
    var i = 0
    if (node.value != null) best = node.value
    var done = false
    while (!done && i < s.length) {
      node.children.get(s.charAt(i)) match {
        case Some(child) =>
          val frag = child.fragment
          if (i + frag.length <= s.length && s.regionMatches(i, frag, 0, frag.length)) {
            i += frag.length
            node = child
            if (node.value != null) best = node.value
          } else done = true
        case None => done = true
      }
    }
    best
  }

  /** (matched-prefix, value) of the longest registered prefix, or null. */
  def longestPrefixEntry(s: String): (String, V) = {
    var best: (String, V) = null
    var node = root
    var i = 0
    var done = false
    while (!done && i < s.length) {
      node.children.get(s.charAt(i)) match {
        case Some(child) =>
          val frag = child.fragment
          if (i + frag.length <= s.length && s.regionMatches(i, frag, 0, frag.length)) {
            i += frag.length
            node = child
            if (node.value != null) best = (s.substring(0, i), node.value)
          } else done = true
        case None => done = true
      }
    }
    best
  }
}
