package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Fixtures from the reference's StringTrie$Test.scala:12-104 (FIXTURES.md §1.2). */
class StringTrieSpec extends AnyFunSuite {

  private def rdfTrie: StringTrie[String] = {
    val t = new StringTrie[String]
    t.put("http://dbpedia.org/resource/", "dbpr")
    t.put("http://dbpedia.org/resource/Category:", "dbpc")
    t.put("http://xmlns.com/foaf/0.1/", "foaf")
    t.put("urn:yahoo:maps", "y")
    t
  }

  test("longest prefix wins") {
    val t = rdfTrie
    assert(t.longestPrefixValue("http://dbpedia.org/resource/Berlin") == "dbpr")
    assert(t.longestPrefixValue("http://dbpedia.org/resource/Category:Cities") == "dbpc")
    assert(t.longestPrefixValue("http://xmlns.com/foaf/0.1/knows") == "foaf")
    assert(t.longestPrefixValue("urn:yahoo:maps:foo") == "y")
  }

  test("exact prefix string is itself a match") {
    assert(rdfTrie.longestPrefixValue("http://dbpedia.org/resource/") == "dbpr")
    assert(rdfTrie.longestPrefixValue("urn:yahoo:maps") == "y")
  }

  test("non-matches and strict prefixes of an entry yield null") {
    val t = rdfTrie
    assert(t.longestPrefixValue("http://example.org/x") == null)
    assert(t.longestPrefixValue("http://dbpedia.org/resour") == null)
    assert(t.longestPrefixValue("urn:yahoo:map") == null)
    assert(t.longestPrefixValue("") == null)
  }

  test("longestPrefixEntry returns the matched prefix") {
    val e = rdfTrie.longestPrefixEntry("http://dbpedia.org/resource/Category:X")
    assert(e == ("http://dbpedia.org/resource/Category:", "dbpc"))
  }

  test("keys that split existing edges resolve correctly") {
    val t = new StringTrie[String]
    t.put("abcdef", "1")
    t.put("abcxyz", "2")
    t.put("abc", "3")
    t.put("a", "4")
    assert(t.longestPrefixValue("abcdefgh") == "1")
    assert(t.longestPrefixValue("abcxyz") == "2")
    assert(t.longestPrefixValue("abcd") == "3")
    assert(t.longestPrefixValue("ab") == "4")
    assert(t.longestPrefixValue("b") == null)
  }
}
