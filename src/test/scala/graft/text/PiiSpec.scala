package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PiiSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def scrubOne(s: String): (String, Long, Long, Long) =
    Seq(s).toDF("t").select(Pii.scrubWithCounts(col("t")).as("r"))
      .select(col("r.clean_text"), col("r.n_emails"), col("r.n_phones"),
        col("r.n_ips"))
      .as[(String, Long, Long, Long)].head()

  test("each kind masks its published surface forms and counts on the original text") {
    assert(scrubOne("mail a.b+tag%x@sub.example.co.uk now") ==
      ("mail <EMAIL> now", 1L, 0L, 0L))
    assert(scrubOne("call +44 20 7946 0958 or (303) 555-0175 or 303-555-0175") ==
      ("call <PHONE> or <PHONE> or <PHONE>", 0L, 3L, 0L))
    // the +CC (area) form masks as ONE number (the TextOps.scrubPii
    // contract, unified here in r16)
    assert(scrubOne("tel +1 (555) 123-4567 done") ==
      ("tel <PHONE> done", 0L, 1L, 0L))
    assert(scrubOne("from 192.168.0.1 and 999.1.2.3 end") ==
      ("from <IP> and <IP> end", 0L, 0L, 2L)) // no octet validation, by design
    // all three kinds in one line, fixed scrub order email→phone→ip
    assert(scrubOne("u1@example.com +1 555 0100 10.0.0.1") ==
      ("<EMAIL> <PHONE> <IP>", 1L, 1L, 1L))
  }

  test("review catches: anchors, national formats, mask-aware accounting") {
    // the US form cannot start mid-digit-run — a longer run is left
    // WHOLE (no stray-digit partial mask), documented out of scope
    assert(scrubOne("card 1234-567-8901 on file") ==
      ("card 1234-567-8901 on file", 0L, 0L, 0L))
    // national trunk-prefixed groups mask ('020 7946 0958')
    assert(scrubOne("ring 020 7946 0958 today") ==
      ("ring <PHONE> today", 0L, 1L, 0L))
    // ...but years and number lists have no trunk zero and survive
    assert(scrubOne("from 1914 1918 and 10 20 30") ==
      ("from 1914 1918 and 10 20 30", 0L, 0L, 0L))
    // digits the email mask consumed are NOT phone-counted: counts
    // equal the sentinels actually inserted
    assert(scrubOne("reach 555-123-4567@example.com now") ==
      ("reach <EMAIL> now", 1L, 0L, 0L))
  }

  test("non-PII neighbors survive: versions, years, decimals, section numbers") {
    // a dotted version is NOT an IPv4 unless it has exactly four parts
    assert(scrubOne("upgrade to version 2.4.1 today") ==
      ("upgrade to version 2.4.1 today", 0L, 0L, 0L))
    // a year or a plain integer is not a phone (phones need +CC or the
    // 3-3-4 separated shape)
    assert(scrubOne("in 2026 we shipped 1234567 units") ==
      ("in 2026 we shipped 1234567 units", 0L, 0L, 0L))
    // a decimal price is untouched
    assert(scrubOne("price 19.99 only") == ("price 19.99 only", 0L, 0L, 0L))
    // an @ without a local part or TLD is not an email
    assert(scrubOne("meet @ noon; a@b is not mail") ==
      ("meet @ noon; a@b is not mail", 0L, 0L, 0L))
  }

  test("masking is idempotent and never reveals a new match") {
    val hairy = "x u@ex.com+1 555 0100 10.1.1.1"
    val once = scrubOne(hairy)._1
    assert(scrubOne(once)._1 == once, "second scrub must be a no-op")
  }
}
