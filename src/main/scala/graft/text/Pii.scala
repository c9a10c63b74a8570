package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction stage of a training-data pipeline
  * (the Dolma/CCNet-style pass that masks emails, phone numbers and IP
  * addresses before text reaches a training shard). Deliberately
  * REGEX-PORTABLE: every pattern uses only the construct subset where
  * Java's regex engine (Spark) and RE2 (the DuckDB oracle) agree —
  * ASCII character classes, bounded repetition, non-capturing groups,
  * `\b` ASCII word boundaries; NO lookaround (RE2 has none), NO
  * backreferences. That portability is what makes the whole stage
  * oracle-checkable instead of best-effort.
  *
  * Honest scope, stated plainly: these are the published
  * high-precision surface patterns (Dolma's taggers use the same
  * shapes) — they catch the overwhelmingly common forms, not
  * adversarial obfuscation ("user at example dot com"), and phone
  * matching is anchored to the international `+CC …` and US
  * `(nnn) nnn-nnnn` shapes to keep false positives off ordinary
  * numbers. A recall-maximal PII system needs NER models that are out
  * of scope offline.
  *
  * Scale shape: pure scalar regexp pipeline — zero shuffles, zero
  * driver work; at 100 TB this is a map-only pass fused into whatever
  * scan feeds it. */
object Pii {

  /** RFC-practical email surface form. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4 dotted quad on word boundaries (no octet-range validation —
    * the published scrubbers mask 999.0.0.1 too; over-masking a
    * non-address costs nothing, leaking a real one costs a lot). */
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Phone numbers, three anchored shapes:
    *   - international `+CC` prefixed (optional parenthesized area
    *     code, then 6–14 digits with optional single separators);
    *   - the US `(nnn) nnn-nnnn` / `nnn-nnn-nnnn` form, word-bounded
    *     on BOTH ends so it can never start mid-digit-run (review
    *     catch: un-anchored it matched '234-567-8901' inside
    *     '1234-567-8901', leaving a stray digit beside the mask; the
    *     leading \b sits INSIDE the optional paren — before '(' the
    *     position is non-word/non-word and no boundary exists);
    *   - national trunk-prefixed groups `0nn[n[n]] nnn[n] nnn[n]`
    *     ('020 7946 0958') — the leading-zero convention is the
    *     anchor that keeps years, prices and number lists unmasked.
    * Out of scope, stated: bare unseparated national digit runs
    * ('5551234567') are indistinguishable from ids/quantities at
    * acceptable precision — the published scrubbers draw the same
    * line. */
  val PhonePattern =
    "\\+\\d{1,3}[ -]?(?:\\(\\d{1,4}\\)[ -]?)?(?:[ -]?\\d){6,14}|" +
      "\\(?\\b\\d{3}\\)?[ -]\\d{3}[ -]\\d{4}\\b|" +
      "\\b0\\d{1,3}[ -]\\d{3,4}[ -]\\d{3,4}\\b"

  val DefaultEmailMask = "<EMAIL>"
  val DefaultPhoneMask = "<PHONE>"
  val DefaultIpMask = "<IP>"

  def maskEmails(c: Column, mask: String = DefaultEmailMask): Column =
    regexp_replace(c, EmailPattern, mask)

  def maskPhones(c: Column, mask: String = DefaultPhoneMask): Column =
    regexp_replace(c, PhonePattern, mask)

  def maskIps(c: Column, mask: String = DefaultIpMask): Column =
    regexp_replace(c, Ipv4Pattern, mask)

  def countEmails(c: Column): Column = regexp_count(c, lit(EmailPattern))
  def countPhones(c: Column): Column = regexp_count(c, lit(PhonePattern))
  def countIps(c: Column): Column = regexp_count(c, lit(Ipv4Pattern))

  /** The full scrub, fixed order email → IP → phone. Order is
    * load-bearing and pinned: email FIRST (its digit-bearing local part
    * must not be bitten into), IP BEFORE phone — the greedy phone
    * repetition would otherwise eat the leading octets of a directly
    * following dotted quad ("+1 555 0100 10.0.0.1" → "<PHONE>.0.0.1"),
    * leaving the rest of the address unmaskable; with the IP already
    * `<IP>`, the phone match stops at the `<`. Residual documented
    * greediness: a bare number directly after a phone ("+1 555 0100
    * 2026") is absorbed into the mask — over-masking an adjacent
    * number is the safe direction for a redaction pass. Counts are
    * taken on the ORIGINAL text (a mask must not create or destroy a
    * neighboring match's countability). */
  def scrub(c: Column): Column =
    maskPhones(maskIps(maskEmails(c)))

  /** `(clean_text, n_emails, n_phones, n_ips)` struct for select-style
    * use. Each kind is counted on the text with the EARLIER stages'
    * masks applied — i.e. exactly what [[scrub]] masks for that kind —
    * so the counts equal the number of sentinels actually inserted
    * (review catch: counting every kind on the original text reported
    * n_phones = 1 for '555-123-4567@example.com' whose digits the
    * email mask had already consumed, so accounting and output
    * disagreed). */
  def scrubWithCounts(c: Column): Column = {
    val afterEmail = maskEmails(c)
    val afterIp = maskIps(afterEmail)
    struct(
      maskPhones(afterIp).as("clean_text"),
      countEmails(c).cast("long").as("n_emails"),
      countPhones(afterIp).cast("long").as("n_phones"),
      countIps(afterEmail).cast("long").as("n_ips"))
  }
}
