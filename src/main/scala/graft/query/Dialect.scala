package graft.query

/** Dialect gates for the two places the engine's client-side matcher
  * could silently disagree with a live server (reference parity anchor:
  * the reference ships `mongo.input.query` VERBATIM —
  * core/src/main/java/com/mongodb/hadoop/input/MongoInputSplit.java:281 —
  * so on a live server the server's dialect is what its users already
  * get; the engine refuses rather than silently substituting its own).
  *
  *  - [[RegexDialect]]: a user-supplied `$regex` evaluates under PCRE on
  *    a live server but under `java.util.regex` in the engine's matcher.
  *    Patterns are classified into the PCRE∩Java COMMON SUBSET (both
  *    dialects provably agree); everything else is gated by the
  *    `regex_dialect` option.
  *  - [[NumericNullEdge]]: `{"m.0": null}` — a null/missing-sensitive
  *    predicate on a dotted path with a NUMERIC segment. Positional and
  *    field-name resolution can disagree on whether a dead-end slot
  *    exists (`{m:[5]}`: index 0 HITS 5, while field-name traversal of
  *    the scalar element dead-ends), and the server's exact
  *    missing-recording rule for that edge is not pinned by any fixture
  *    this sandbox can run — gated by the `numeric_null_paths` option.
  */
object RegexDialect {

  /** Read option: `portable` (default) refuses out-of-subset patterns
    * loudly on EVERY transport; `java` accepts them with documented
    * `java.util.regex` semantics everywhere (the server transport keeps
    * them as client-side residuals — [[graft.server.QueryDocs.render]]
    * refuses the wire form, so evaluation is uniformly Java);
    * `server` ships them verbatim (server-authoritative, reference
    * parity) and is accepted only on the server transport.
    */
  val OptionKey = "regex_dialect"

  /** None = the pattern/flags pair is inside the PCRE∩Java common
    * subset; Some(reason) otherwise. The subset is CONSERVATIVE — a
    * refused pattern costs a client-side residual (or a loud error
    * under the default mode), never a wrong answer.
    *
    * In the subset (agreement argued per item):
    *  - flags `i`/`m`/`s` (the engine compiles user `$regex` with
    *    UNIX_LINES, so `.`/`^`/`$` recognize ONLY `\n` — exactly PCRE's
    *    default newline convention; `i` over an ASCII-only pattern is
    *    ASCII case-folding in both);
    *  - ASCII literals, `.` `^` `$` `|`, groups `(...)`/`(?:...)`,
    *    quantifiers `*` `+` `?` `{m}` `{m,}` `{m,n}` with optional lazy
    *    `?` suffix;
    *  - escapes of the metacharacters, `\n \t \r \f`, `\A` `\z`, and
    *    `\Q...\E` quoting (any content, incl. non-ASCII, when `i` is
    *    off — literal equality agrees across UTF-16/UTF-8);
    *  - classes `[...]`: negation, ASCII literal members, literal-to-
    *    literal ranges, the escape set above.
    *
    * OUT (documented divergence corners): possessive quantifiers,
    * `(?...)` beyond `(?:`, inline flags, lookaround, backreferences,
    * `\d \w \s \b`-family and POSIX classes (UCP/class-set corners),
    * class intersection `&&` (Java-only; PCRE reads it as literals),
    * nested/POSIX `[` inside a class (PCRE reads `[` as a literal
    * there), `\Z` (Java recognizes `\r`-family terminators before it
    * even under UNIX_LINES), `{,n}` (PCRE2-only quantifier), `x` flag
    * (comment-syntax corners), non-ASCII outside `\Q...\E`, and
    * unescaped `]`/`}` metacharacter reuse.
    */
  def nonPortable(pattern: String, opts: String): Option[String] = {
    if (!opts.forall(c => c == 'i' || c == 'm' || c == 's'))
      return Some(s"$$options '$opts' outside the i/m/s common subset")
    val caseless = opts.contains('i')
    val n = pattern.length
    var i = 0
    var depth = 0
    var atom = false // a quantifier may follow
    def asciiOk(c: Char): Boolean = c < 0x80
    while (i < n) {
      val c = pattern(i)
      c match {
        case '\\' =>
          if (i + 1 >= n) return Some("trailing backslash")
          val e = pattern(i + 1)
          if (e == 'Q') {
            val end = pattern.indexOf("\\E", i + 2)
            if (end < 0) return Some("\\Q without closing \\E")
            val quoted = pattern.substring(i + 2, end)
            if (caseless && !quoted.forall(asciiOk))
              return Some("non-ASCII \\Q literal under the i flag " +
                "(case-folding dialects differ beyond ASCII)")
            i = end + 2
            atom = quoted.nonEmpty || atom
          } else if ("\\^$.|?*+()[]{}-/".indexOf(e.toInt) >= 0 ||
              e == 'n' || e == 't' || e == 'r' || e == 'f') {
            atom = true; i += 2
          } else if (e == 'A' || e == 'z') {
            atom = false; i += 2
          } else return Some(s"escape \\$e outside the PCRE∩Java common subset")
        case '[' =>
          classEnd(pattern, i, caseless) match {
            case Right(end) => i = end; atom = true
            case Left(reason) => return Some(reason)
          }
        case '(' =>
          if (i + 1 < n && pattern(i + 1) == '?') {
            if (i + 2 < n && pattern(i + 2) == ':') i += 3
            else return Some("(?...) group syntax outside the common subset")
          } else i += 1
          depth += 1; atom = false
        case ')' =>
          if (depth == 0) return Some("unbalanced ')'")
          depth -= 1; atom = true; i += 1
        case '|' => atom = false; i += 1
        case '*' | '+' | '?' =>
          if (!atom) return Some(s"quantifier '$c' with nothing to repeat")
          i += 1
          if (i < n && pattern(i) == '?') i += 1 // lazy — agrees
          else if (i < n && (pattern(i) == '+'))
            return Some("possessive quantifier (engine-dialect corner)")
          atom = false
        case '{' =>
          if (!atom) return Some("'{' with nothing to repeat (literal-brace corners)")
          var j = i + 1
          while (j < n && pattern(j).isDigit) j += 1
          if (j == i + 1) return Some("'{' not starting a {m[,n]} quantifier")
          val lo = pattern.substring(i + 1, j)
          var hi = lo
          if (j < n && pattern(j) == ',') {
            j += 1
            val h0 = j
            while (j < n && pattern(j).isDigit) j += 1
            hi = if (j == h0) "" else pattern.substring(h0, j)
          }
          if (j >= n || pattern(j) != '}')
            return Some("unterminated {m[,n]} quantifier")
          // {m,n} with n<m errors in both engines (but client- vs
          // server-side), and PCRE hard-caps quantifier bounds at 65535
          // where Java accepts up to Int.MaxValue — refuse both corners
          if (lo.length > 5 || hi.length > 5 ||
              lo.toLong > 65535 || (hi.nonEmpty && hi.toLong > 65535) ||
              (hi.nonEmpty && hi.toLong < lo.toLong))
            return Some(s"{m,n} bounds {$lo,$hi} outside the common subset " +
              "(PCRE caps at 65535; inverted bounds error in both)")
          i = j + 1
          if (i < n && pattern(i) == '?') i += 1
          else if (i < n && pattern(i) == '+')
            return Some("possessive quantifier (engine-dialect corner)")
          atom = false
        case '}' => return Some("unescaped '}'")
        case ']' => return Some("unescaped ']'")
        case '.' => atom = true; i += 1
        case '^' | '$' => atom = false; i += 1
        case ch if asciiOk(ch) => atom = true; i += 1
        case ch =>
          return Some(f"non-ASCII pattern character U+${ch.toInt}%04X " +
            "outside \\Q...\\E")
      }
    }
    if (depth != 0) Some("unbalanced '('") else None
  }

  /** Scan a character class starting at `pattern(start) == '['`; returns
    * the index AFTER the closing ']' or the refusal reason. */
  private def classEnd(pattern: String, start: Int,
      caseless: Boolean): Either[String, Int] = {
    val n = pattern.length
    var i = start + 1
    if (i < n && pattern(i) == '^') i += 1
    if (i < n && pattern(i) == ']')
      return Left("class starting with ']' (PCRE literal / Java corner)")
    var members = 0
    // kind of the PREVIOUS member: 0 none, 1 plain literal (range-able),
    // 2 escape/range-end (not a range start)
    var prev = 0
    while (i < n && pattern(i) != ']') {
      pattern(i) match {
        case '\\' =>
          if (i + 1 >= n) return Left("trailing backslash in class")
          val e = pattern(i + 1)
          if ("\\^$.|?*+()[]{}-/".indexOf(e.toInt) >= 0 ||
              e == 'n' || e == 't' || e == 'r' || e == 'f') {
            i += 2; members += 1; prev = 2
          } else return Left(s"class escape \\$e outside the common subset")
        case '[' =>
          return Left("'[' inside a class (POSIX/nested-class corners)")
        case '&' if i + 1 < n && pattern(i + 1) == '&' =>
          return Left("class intersection '&&' (Java-only syntax)")
        case '-' if prev == 1 && i + 1 < n && pattern(i + 1) != ']' =>
          // a range: the end must be a PLAIN ASCII literal >= the start
          val lo = pattern(i - 1)
          val hi = pattern(i + 1)
          if (hi == '\\' || hi == '[' || hi == '-')
            return Left("range end outside the plain-literal subset")
          if (hi >= 0x80) return Left("non-ASCII range end")
          if (hi < lo) return Left(s"inverted class range $lo-$hi")
          i += 2; prev = 2
        case ch if ch < 0x80 => i += 1; members += 1; prev = 1
        case ch =>
          return Left(f"non-ASCII class member U+${ch.toInt}%04X")
      }
    }
    if (i >= n) Left("unterminated character class")
    else if (members == 0) Left("empty character class")
    else Right(i + 1)
  }

  def portable(pattern: String, opts: String): Boolean =
    nonPortable(pattern, opts).isEmpty

  /** Every non-portable plain-`$regex` node in a query tree, with its
    * refusal reason. [[BQuery.RegexServer]] nodes (already adjudicated
    * server-authoritative) and the engine-compiled ReadStr* nodes (never
    * rendered; Spark read semantics) are not collected. */
  def nonPortableIn(q: BQuery): Seq[(BQuery.Regex, String)] = q match {
    case r @ BQuery.Regex(_, pat, o) =>
      nonPortable(pat, o).map(r -> _).toSeq
    case BQuery.And(qs) => qs.flatMap(nonPortableIn)
    case BQuery.Or(qs) => qs.flatMap(nonPortableIn)
    case BQuery.Nor(qs) => qs.flatMap(nonPortableIn)
    case BQuery.ElemMatch(_, sub, _) => nonPortableIn(sub)
    case BQuery.NotOp(_, sub) => nonPortableIn(sub)
    case _ => Nil
  }

  /** Apply the `regex_dialect` mode to an option-level query on one
    * transport. Throws on the default mode when any `$regex` falls
    * outside the common subset; under `server` on the server transport
    * the offending nodes become [[BQuery.RegexServer]] (verbatim wire
    * form, server evaluation authoritative). */
  def forTransport(q: BQuery, mode: String, serverTransport: Boolean): BQuery =
    mode match {
      case "java" => q // engine dialect everywhere (wire render refuses)
      case "server" =>
        if (!serverTransport)
          throw new IllegalArgumentException(
            s"$OptionKey=server needs a live-server transport: this " +
              "scan evaluates queries client-side with java.util.regex. " +
              s"Use $OptionKey=java to accept the engine dialect here.")
        replaceServer(q)
      case "portable" | "" =>
        nonPortableIn(q) match {
          case Seq() => q
          case (r, reason) +: _ =>
            throw new IllegalArgumentException(
              s"$$regex pattern '${r.pattern}' on '${r.path}' is outside " +
                s"the PCRE∩Java common subset ($reason) — its result " +
                "would depend on which dialect evaluates it. Set " +
                s"$OptionKey=java to accept java.util.regex semantics " +
                s"on every transport, or $OptionKey=server (live-server " +
                "scans only) to ship it verbatim, server-authoritative.")
        }
      case other =>
        throw new IllegalArgumentException(
          s"unknown $OptionKey '$other' (portable | java | server)")
    }

  private def replaceServer(q: BQuery): BQuery = q match {
    case r @ BQuery.Regex(p, pat, o) =>
      if (portable(pat, o)) r else BQuery.RegexServer(p, pat, o)
    case BQuery.And(qs) => BQuery.And(qs.map(replaceServer))
    case BQuery.Or(qs) => BQuery.Or(qs.map(replaceServer))
    case BQuery.Nor(qs) => BQuery.Nor(qs.map(replaceServer))
    case BQuery.ElemMatch(p, sub, vf) =>
      BQuery.ElemMatch(p, replaceServer(sub), vf)
    case BQuery.NotOp(p, sub) => BQuery.NotOp(p, replaceServer(sub))
    case other => other
  }
}

/** The `{"m.0": null}` edge: a null/missing-sensitive predicate on a
  * dotted path whose NON-HEAD segment is all digits resolves both
  * positionally and by field name when an array sits at that segment,
  * and the two interpretations disagree about dead-end (missing) slots
  * — `{m:[5]}`: index 0 hits 5 (not null), while field-name traversal
  * of the scalar element dead-ends (null matches missing). A live
  * server is authoritative for its own rule; the engine's file-backed
  * matcher refuses the edge rather than pick silently.
  */
object NumericNullEdge {

  /** `refuse` (default) throws on the file transport; `engine` accepts
    * the engine matcher's rule (positional ∪ field-name resolution,
    * dead-ends recorded as missing slots — the documented superset). */
  val OptionKey = "numeric_null_paths"

  private def numericTail(path: String, insideElem: Boolean): Boolean = {
    val segs = path.split('.')
    val candidates = if (insideElem) segs.toSeq else segs.toSeq.drop(1)
    // the HEAD segment resolves against the root document (never an
    // array), so a top-level numeric field name is unambiguous — unless
    // the path is elemMatch-relative, where the element can be an array
    candidates.exists(s => s.nonEmpty && s.forall(_.isDigit))
  }

  private def nullSensitive(q: BQuery, insideElem: Boolean): Seq[String] =
    q match {
      case BQuery.Eq(p, graft.bson.BNull) if numericTail(p, insideElem) => Seq(p)
      case BQuery.Ne(p, graft.bson.BNull) if numericTail(p, insideElem) => Seq(p)
      case BQuery.In(p, vs)
          if vs.contains(graft.bson.BNull) && numericTail(p, insideElem) => Seq(p)
      case BQuery.Nin(p, vs)
          if vs.contains(graft.bson.BNull) && numericTail(p, insideElem) => Seq(p)
      case BQuery.And(qs) => qs.flatMap(nullSensitive(_, insideElem))
      case BQuery.Or(qs) => qs.flatMap(nullSensitive(_, insideElem))
      case BQuery.Nor(qs) => qs.flatMap(nullSensitive(_, insideElem))
      case BQuery.ElemMatch(_, sub, _) => nullSensitive(sub, insideElem = true)
      case BQuery.NotOp(_, sub) => nullSensitive(sub, insideElem)
      case _ => Nil
    }

  /** Paths of null-sensitive predicates with an ambiguous numeric
    * segment. */
  def edges(q: BQuery): Seq[String] = nullSensitive(q, insideElem = false)

  /** Gate an option-level query for CLIENT-side (file/fake) evaluation;
    * live-server scans never call this (the wire form ships verbatim and
    * the server's own rule applies, reference parity). */
  def check(q: BQuery, mode: Option[String]): Unit = mode.getOrElse("refuse") match {
    case "engine" => ()
    case "refuse" =>
      val es = edges(q)
      if (es.nonEmpty)
        throw new IllegalArgumentException(
          s"null/missing test on numeric path segment '${es.head}': " +
            "positional and field-name resolution disagree on dead-end " +
            "slots, and this transport evaluates queries client-side. " +
            s"Rewrite the path, run against a live server (its rule is " +
            s"authoritative there), or set $OptionKey=engine to accept " +
            "the engine matcher's documented rule.")
    case other =>
      throw new IllegalArgumentException(
        s"unknown $OptionKey '$other' (refuse | engine)")
  }
}
