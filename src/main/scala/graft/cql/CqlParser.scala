package graft.cql

/** AST for the supported CQL SELECT subset. */
sealed trait CqlSelector { def isAggregate: Boolean = false }
case object Star extends CqlSelector
case class ColumnSelector(name: String, alias: Option[String]) extends CqlSelector
/** `CAST(col AS cqltype)` (upstream `cql3/functions/CastFcts.java` [U]). */
case class CastSelector(column: String,
  to: org.apache.spark.sql.types.DataType, toName: String,
  alias: Option[String]) extends CqlSelector
/** A function-call argument: a column reference or a literal (scalar or
  * collection — e.g. the query vector of `similarity_cosine(emb, [..])`). */
sealed trait CqlFnArg
case class ColArg(name: String) extends CqlFnArg
case class LitArg(value: Any) extends CqlFnArg
case class FunctionSelector(fn: String, args: Seq[CqlFnArg], alias: Option[String])
    extends CqlSelector {
  override def isAggregate: Boolean =
    Set("count", "min", "max", "sum", "avg").contains(fn.toLowerCase)
}

/** Arithmetic operator expressions in the selection clause (Cassandra 4.0
  * native operators, CASSANDRA-11935 — upstream
  * `cql3/functions/OperationFcts.java` [U]): `+ - * / %` over numeric
  * columns and literals, `* / %` binding tighter than `+ -`, parentheses
  * and unary minus. Division of two integral operands is integer division
  * (Java truncation-toward-zero semantics), as upstream. */
sealed trait CqlArith
case class ArithCol(name: String) extends CqlArith
case class ArithLit(value: Any) extends CqlArith
case class ArithNeg(inner: CqlArith) extends CqlArith
case class ArithBin(op: String, left: CqlArith, right: CqlArith)
  extends CqlArith
/** A function call as an operand — `sum(q) / count(*)`, `avg(v) + 1`
  * (upstream operators compose over selectable functions). */
case class ArithFn(fn: FunctionSelector) extends CqlArith
/** `text` renders the expression for the upstream-style default result
  * column name (`a + b`); an explicit alias wins. Aggregate when any
  * operand is a builtin aggregate call (the engine additionally checks
  * session-registered UDAs). */
case class ArithSelector(expr: CqlArith, text: String,
  alias: Option[String]) extends CqlSelector {
  override def isAggregate: Boolean = {
    def rec(e: CqlArith): Boolean = e match {
      case ArithFn(f) => f.isAggregate
      case ArithNeg(i) => rec(i)
      case ArithBin(_, l, r) => rec(l) || rec(r)
      case _ => false
    }
    rec(expr)
  }
}

sealed trait CqlPredicate
/** `column op value(s)`; `isToken` marks `token(column) op value`. */
case class ColumnPredicate(column: String, op: String, values: Seq[Any],
  isToken: Boolean = false) extends CqlPredicate
case class TuplePredicate(columns: Seq[String], op: String, values: Seq[Any])
  extends CqlPredicate
/** Cassandra 5.0 disjunction (CEP-29, `WHERE a = 1 OR b = 2` [U
  * cql3/restrictions/StatementRestrictions, 5.0 OR support]): each branch
  * is a conjunction; branches may nest further disjunctions through
  * parentheses. AND binds tighter than OR, as upstream. */
case class OrPredicate(branches: Seq[Seq[CqlPredicate]]) extends CqlPredicate

case class OrderBy(column: String, asc: Boolean)

/** One GROUP BY item: a column, optionally bucketed by `floor(col, dur)`
  * (upstream 4.0 `GROUP BY floor(ts, 1d)` — `cql3/functions/TimeFcts`
  * floor family [U]); `floorMicros` is the bucket width. */
case class CqlGroupItem(column: String, floorMicros: Option[Long] = None)

/** `ORDER BY column ANN OF [v, …]` (Cassandra 5.0 vector search). */
case class AnnOrderBy(column: String, query: Seq[Float])

case class CqlSelect(
  selectors: Seq[CqlSelector],
  table: String,
  predicates: Seq[CqlPredicate],
  groupBy: Seq[CqlGroupItem],
  orderBy: Option[Seq[OrderBy]],
  ann: Option[AnnOrderBy],
  perPartitionLimit: Option[Any],
  limit: Option[Any],
  allowFiltering: Boolean,
  distinct: Boolean,
  json: Boolean)

/** Hand-rolled tokenizer + recursive-descent parser for the CQL `SELECT`
  * grammar subset (upstream grammar: `src/antlr/Cql.g` [U], unverifiable per
  * SURVEY §0 — re-derived from the public CQL spec). No parser libraries —
  * zero added dependencies. */
object CqlParser {

  // '-' is always its own token; unary minus is folded in parseLiteral.
  // (Lexing '-5' as one literal made 'SET c=c-5' — no spaces — miss the
  // counter-decrement pattern and crash in parseLiteral instead.)
  private val tokenRe =
    """\s*(?:('(?:[^']|'')*')|(0[xX][0-9a-fA-F]*)|(\d+\.\d+(?:[eE][-+]?\d+)?|\d+[eE][-+]?\d+)|(\d+)|([A-Za-z_][A-Za-z0-9_]*)|(<=|>=|!=|[=<>(),*\[\]{}:;+.?%/-]))""".r

  private def tokenize(s: String): Vector[String] = {
    var rest = s.trim
    val out = Vector.newBuilder[String]
    while (rest.nonEmpty) {
      tokenRe.findPrefixMatchOf(rest) match {
        case Some(m) =>
          out += m.group(0).trim
          rest = rest.substring(m.end)
        case None =>
          throw new CqlInvalidQueryException(s"cannot tokenize near: $rest")
      }
    }
    out.result()
  }

  private class Cursor(toks: Vector[String]) {
    private var i = 0
    def peek: String = if (i < toks.length) toks(i) else ""
    def peekAt(n: Int): String = if (i + n < toks.length) toks(i + n) else ""
    def peekIs(kw: String): Boolean = peek.equalsIgnoreCase(kw)
    def next(): String = { val t = peek; i += 1; t }
    def expect(kw: String): Unit =
      if (!next().equalsIgnoreCase(kw))
        throw new CqlInvalidQueryException(s"expected $kw near ${toks.drop(i - 1).take(4).mkString(" ")}")
    def accept(kw: String): Boolean =
      if (peekIs(kw)) { i += 1; true } else false
    def done: Boolean = i >= toks.length
  }

  /** `name` or `keyspace.name` — the keyspace qualifier is accepted and
    * dropped (the façade's catalog is flat). */
  /** Table names: bare names stay bare (the SESSION resolves them against
    * its current keyspace at the statement boundary); qualified names
    * stay `ks.t` — the session folds `default.` to the bare canonical
    * form, never the parser (an explicit default qualifier must survive
    * to the boundary or a `USE ks` would re-target it). System virtual
    * tables keep their upstream qualified names [U db/virtual/,
    * schema/SchemaKeyspace.java]. */
  private def tableName(c: Cursor): String = {
    val n = c.next()
    if (c.accept(".")) s"${n.toLowerCase}.${c.next()}" else n
  }

  def parse(cql: String): CqlSelect = {
    val c = new Cursor(tokenize(cql.stripSuffix(";")))
    val sel = parseSelectCursor(c)
    if (!c.done)
      throw new CqlInvalidQueryException(s"unexpected trailing input near ${c.peek}")
    sel
  }

  /** SELECT parsed off an open cursor; stops before any trailing tokens the
    * caller owns (the materialized-view DDL's `PRIMARY KEY …` tail). */
  private def parseSelectCursor(c: Cursor): CqlSelect = {
    c.expect("select")
    val json = c.accept("json")
    val distinct = c.accept("distinct")
    val selectors = parseSelectors(c)
    c.expect("from")
    val table = tableName(c)
    var preds = Seq.empty[CqlPredicate]
    if (c.accept("where")) preds = parseWhereExpr(c)
    var groupBy = Seq.empty[CqlGroupItem]
    if (c.accept("group")) {
      c.expect("by")
      def item(): CqlGroupItem = {
        val n = c.next()
        if (n.equalsIgnoreCase("floor") && c.accept("(")) {
          val colName = c.next(); c.expect(",")
          val dur = parseDurationMicros(c); c.expect(")")
          CqlGroupItem(colName, Some(dur))
        } else CqlGroupItem(n)
      }
      groupBy = Seq(item())
      while (c.accept(",")) groupBy = groupBy :+ item()
    }
    var orderBy: Option[Seq[OrderBy]] = None
    var ann: Option[AnnOrderBy] = None
    if (c.accept("order")) {
      c.expect("by")
      val first = c.next()
      if (c.accept("ann")) { // ORDER BY col ANN OF [v, …] — must be sole order
        c.expect("of")
        c.expect("[")
        var vs = Seq(parseLiteral(c))
        while (c.accept(",")) vs = vs :+ parseLiteral(c)
        c.expect("]")
        ann = Some(AnnOrderBy(first, vs.map {
          case d: Double => d.toFloat
          case l: Long => l.toFloat
          case other => throw new CqlInvalidQueryException(
            s"ANN OF vector must be numeric, got $other")
        }))
      } else {
        // the ANN lookahead already consumed the first column name; the
        // direction parse is parseOrderBy's, applied to that column
        var obs = Seq(orderByDirection(c, first))
        while (c.accept(",")) obs = obs :+ parseOrderBy(c)
        orderBy = Some(obs)
      }
    }
    var perPartitionLimit: Option[Any] = None
    if (c.accept("per")) {
      c.expect("partition"); c.expect("limit")
      perPartitionLimit = Some(parseLimitValue(c))
    }
    var limit: Option[Any] = None
    if (c.accept("limit")) limit = Some(parseLimitValue(c))
    val allowFiltering = if (c.accept("allow")) { c.expect("filtering"); true } else false
    CqlSelect(selectors, table, preds, groupBy, orderBy, ann,
      perPartitionLimit, limit, allowFiltering, distinct, json)
  }

  /** Parse an INSERT/UPDATE/DELETE statement (SURVEY §2.12 write surface). */
  def parseDml(cql: String): CqlDml = {
    val c = new Cursor(tokenize(cql.stripSuffix(";")))
    val stmt = parseDmlCursor(c)
    if (!c.done)
      throw new CqlInvalidQueryException(s"unexpected trailing input near ${c.peek}")
    stmt
  }

  /** Parse `BEGIN [UNLOGGED|LOGGED] BATCH [USING TIMESTAMP n] <dml>; …
    * APPLY BATCH` (upstream `cql3/statements/BatchStatement.java` [U]). */
  def parseBatch(cql: String): CqlBatch = {
    val c = new Cursor(tokenize(cql.stripSuffix(";")))
    c.expect("begin")
    val unlogged = c.accept("unlogged")
    c.accept("logged")
    val counter = c.accept("counter")
    c.expect("batch")
    val (ts, batchTtl) = parseUsing(c)
    // upstream Cql.g: "Global TTL on the BATCH statement is not supported"
    // — only TIMESTAMP may ride the batch USING clause
    if (batchTtl.isDefined)
      throw new CqlInvalidQueryException(
        "Global TTL on the BATCH statement is not supported.")
    var stmts = Vector.empty[CqlDml]
    while (!c.peekIs("apply")) {
      if (c.done) throw new CqlInvalidQueryException("missing APPLY BATCH")
      stmts = stmts :+ parseDmlCursor(c)
      while (c.accept(";")) ()
    }
    c.expect("apply"); c.expect("batch")
    if (!c.done)
      throw new CqlInvalidQueryException(s"unexpected trailing input near ${c.peek}")
    // counter batches are unlogged upstream (no batchlog for counters)
    CqlBatch(stmts, ts, logged = !unlogged && !counter, counter = counter)
  }

  private def parseDmlCursor(c: Cursor): CqlDml =
    c.next().toLowerCase match {
      case "insert" =>
        c.expect("into")
        val table = tableName(c)
        if (c.accept("json")) { // INSERT INTO t JSON '…' [U cql3/Json.java]
          val json = parseLiteral(c) match {
            case s: String => s
            case other => throw new CqlInvalidQueryException(
              s"INSERT JSON expects a string literal, got $other")
          }
          val defaultUnset =
            if (c.accept("default")) {
              if (c.accept("unset")) true else { c.expect("null"); false }
            } else false
          val (ts, ttl) = parseUsing(c)
          CqlInsertJson(table, json, defaultUnset, ts, ttl)
        } else {
          c.expect("(")
          val cols = parseIdentList(c)
          c.expect(")")
          c.expect("values")
          c.expect("(")
          var vals = Seq(parseValue(c))
          while (c.accept(",")) vals = vals :+ parseValue(c)
          c.expect(")")
          val cond = parseCondition(c)
          cond.foreach {
            case IfNotExists => ()
            case _ => throw new CqlInvalidQueryException(
              "INSERT supports only IF NOT EXISTS")
          }
          val (ts, ttl) = parseUsing(c)
          CqlInsert(table, cols, vals, ts, ttl, cond)
        }
      case "update" =>
        val table = tableName(c)
        val (ts, ttl) = parseUsing(c)
        c.expect("set")
        var assigns = Seq(parseAssignment(c))
        while (c.accept(",")) assigns = assigns :+ parseAssignment(c)
        c.expect("where")
        val preds = parseKeyPredicates(c)
        CqlUpdate(table, assigns, preds, ts, ttl, parseCondition(c))
      case "delete" =>
        // DELETE [col[, …] | col[sub], …] FROM t — with columns it's a CELL
        // delete (per-cell tombstones, or one collection ELEMENT when
        // subscripted), without it's the row tombstone
        val cols = if (c.peekIs("from")) Nil else {
          def item(): CqlDelItem = {
            val name = c.next()
            if (c.accept("[")) {
              val sub = parseLiteral(c); c.expect("]")
              CqlDelItem(name, Some(sub))
            } else if (c.accept(".")) { // DELETE u.field — UDT field delete
              CqlDelItem(name, Some(CqlFieldSub(c.next())))
            } else CqlDelItem(name)
          }
          var out = Seq(item())
          while (c.accept(",")) out = out :+ item()
          out
        }
        c.expect("from")
        val table = tableName(c)
        val (ts, delTtl) = parseUsing(c)
        if (delTtl.isDefined)
          throw new CqlInvalidQueryException(
            "TTL is not supported on DELETE statements")
        c.expect("where")
        val preds = parseKeyPredicates(c)
        CqlDelete(table, preds, ts, parseCondition(c), cols)
      case other =>
        throw new CqlInvalidQueryException(s"not a DML statement: $other")
    }

  /** A literal or a collection literal: `[..]` list, `{..}` set,
    * `{k: v, ..}` map (upstream `cql3/Term`/`Lists`/`Sets`/`Maps` [U]). */
  private def parseValue(c: Cursor): Any =
    if (c.accept("[")) {
      if (c.accept("]")) CqlList(Nil)
      else {
        // items recurse: `[{'a': 1}, …]` is a list<frozen<map<…>>>
        var items = Seq(parseValue(c))
        while (c.accept(",")) items = items :+ parseValue(c)
        c.expect("]")
        CqlList(items)
      }
    } else if (c.accept("{")) {
      if (c.accept("}")) CqlSetLit(Nil)
      else if (c.peek.headOption.exists(h => h.isLetter || h == '_') &&
          !Set("true", "false", "null")(c.peek.toLowerCase) &&
          c.peekAt(1) == ":") {
        // `{field: v, …}` with BARE identifiers = UDT literal (upstream
        // `cql3/UserTypes` [U]; map keys are always quoted/typed literals)
        def field(): (String, Any) = {
          val n = c.next(); c.expect(":"); n -> parseValue(c)
        }
        var fs = Seq(field())
        while (c.accept(",")) fs = fs :+ field()
        c.expect("}")
        CqlUdtLit(fs)
      } else {
        val first = parseValue(c)
        if (c.accept(":")) { // map literal (values recurse for frozen nests)
          var entries = Seq(first -> parseValue(c))
          while (c.accept(",")) {
            val k = parseValue(c); c.expect(":")
            entries = entries :+ (k -> parseValue(c))
          }
          c.expect("}")
          CqlMapLit(entries)
        } else {
          var items = Seq(first)
          while (c.accept(",")) items = items :+ parseValue(c)
          c.expect("}")
          CqlSetLit(items)
        }
      }
    } else parseTerm(c)

  /** `col = value`, `col = col + coll`, `col = col - coll`, `col[k] = v`
    * (upstream `cql3/Operation.java` [U]). */
  private def parseAssignment(c: Cursor): (String, CqlAssign) = {
    val col = c.next()
    if (c.accept("[")) { // m[k] = v
      val key = parseLiteral(c)
      c.expect("]"); c.expect("=")
      return col -> CqlMapPut(key, parseLiteral(c))
    }
    if (c.accept(".")) { // u.field = v — non-frozen UDT field write
      val f = c.next()
      c.expect("=")
      return col -> CqlFieldSet(f, parseValue(c))
    }
    // `c += v` / `c -= v` shorthand (CQL 3.1 additionAssignment [U]) —
    // sugar for `c = c + v` / `c = c - v`
    val shorthand: Option[Boolean] =
      if (c.peek == "+" && c.peekAt(1) == "=") { c.next(); c.next(); Some(true) }
      else if (c.peek == "-" && c.peekAt(1) == "=") {
        c.next(); c.next(); Some(false)
      } else None
    def opAssign(add: Boolean): (String, CqlAssign) =
      parseValue(c) match {
        case v @ (_: CqlList | _: CqlSetLit | _: CqlMapLit) =>
          col -> (if (add) CqlCollAdd(v) else CqlCollRemove(v))
        case n: Long => // counter increment / decrement
          col -> CqlCounterAdd(if (add) n else -n)
        // a whole-collection (or counter-delta) bind marker: the bound
        // value's shape is validated at apply time against the column type
        // (upstream prepares these per column metadata)
        case m @ (CqlBindMarker | _: CqlNamedMarker) =>
          col -> (if (add) CqlCollAdd(m) else CqlCollRemove(m))
        case other => throw new CqlInvalidQueryException(
          s"expected a collection literal or counter delta, got $other")
      }
    shorthand match {
      case Some(add) => opAssign(add)
      case None =>
        c.expect("=")
        if (c.peekIs(col) && (c.peekAt(1) == "+" || c.peekAt(1) == "-")) {
          c.next()
          opAssign(c.next() == "+")
        } else {
          val v = parseValue(c)
          if (c.accept("+")) { // `l = [v] + l` list prepend [U Lists.Prepender]
            val rhsCol = c.next()
            if (!rhsCol.equalsIgnoreCase(col))
              throw new CqlInvalidQueryException(
                s"prepend must reference the assigned column $col, got $rhsCol")
            v match {
              case lv: CqlList => col -> CqlCollPrepend(lv)
              // a whole-list bind marker is legal here (`l = ? + l`,
              // upstream Lists.Prepender); the apply side rejects a bound
              // non-list after substitution
              case CqlBindMarker | _: CqlNamedMarker =>
                col -> CqlCollPrepend(v)
              case other => throw new CqlInvalidQueryException(
                s"only a list literal can be prepended, got $other")
            }
          } else col -> CqlAssignValue(v)
        }
    }
  }

  /** Parse `CREATE TABLE` / `DROP TABLE` / `TRUNCATE` (upstream
    * `cql3/statements/schema/` [U]). `WITH …` table options are accepted and
    * ignored (compaction/caching tuning has no analogue here). */
  def parseDdl(cql: String,
      udts: Map[String, org.apache.spark.sql.types.StructType] = Map.empty): CqlDdl = {
    val c = new Cursor(tokenize(cql.stripSuffix(";")))
    val ddl = parseDdlCursor(c, udts)
    if (!c.done)
      throw new CqlInvalidQueryException(
        s"unexpected trailing input near ${c.peek}")
    ddl
  }

  /** cqlsh `COPY t [(c1, c2)] TO|FROM 'path' [WITH HEADER = TRUE
    * [AND DELIMITER = ';']]`. */
  def parseCopy(cql: String): CqlCopy = {
    val c = new Cursor(tokenize(cql.stripSuffix(";")))
    c.expect("copy")
    val table = tableName(c)
    var cols = Seq.empty[String]
    if (c.accept("(")) {
      cols = Seq(c.next())
      while (c.accept(",")) cols = cols :+ c.next()
      c.expect(")")
    }
    val to =
      if (c.accept("to")) true
      else { c.expect("from"); false }
    val path = parseLiteral(c) match {
      case s: String => s
      case other => throw new CqlInvalidQueryException(
        s"COPY expects a quoted path, got $other")
    }
    // engine default: TO and FROM share HEADER=true so round-trips are
    // hermetic (cqlsh defaults HEADER to false; pass WITH HEADER = FALSE
    // for headerless files)
    var header = true
    var delimiter = ","
    if (c.accept("with")) {
      var more = true
      while (more) {
        val key = c.next().toLowerCase
        c.expect("=")
        val v = c.next()
        key match {
          case "header" => header = v.equalsIgnoreCase("true")
          case "delimiter" =>
            delimiter = parseLiteralToken(v)
          case _ => () // other cqlsh options (CHUNKSIZE, …) are client
                       // tuning knobs: parsed and discarded
        }
        more = c.accept("and")
      }
    }
    if (!c.done) throw new CqlInvalidQueryException(
      s"unexpected trailing input near ${c.peek}")
    CqlCopy(table, cols, to, path, header, delimiter)
  }

  /** A single already-read token as a string literal value. */
  private def parseLiteralToken(t: String): String =
    if (t.startsWith("'")) t.substring(1, t.length - 1).replace("''", "'")
    else t

  /** The full auth statement surface (upstream `cql3/statements/
    * CreateRoleStatement`, `GrantPermissionsStatement`,
    * `ListPermissionsStatement`, `ListRolesStatement` [U]):
    * `CREATE/ALTER/DROP ROLE`, `GRANT/REVOKE … ON … TO/FROM`,
    * `LIST [ALL|<perm>] PERMISSIONS [ON res] [OF role]`,
    * `LIST ROLES [OF role]`. */
  def parseAuth(cql: String): CqlAuth = {
    val c = new Cursor(tokenize(cql.stripSuffix(";")))
    val out = c.next().toLowerCase match {
      case "create" if c.peekIs("user") =>
        // legacy `CREATE USER` [U CreateRoleStatement: users are roles
        // with LOGIN defaulting to TRUE]
        c.next()
        val ifNotExists =
          c.accept("if") && { c.expect("not"); c.expect("exists"); true }
        val name = roleName(c)
        var pw = Option.empty[String]
        if (c.accept("with")) { c.expect("password"); pw = Some(
          parseLiteralToken(c.next())) }
        val su =
          if (c.accept("superuser")) true
          else { c.accept("nosuperuser"); false }
        CqlCreateRole(name, ifNotExists, su, login = true, pw)
      case "drop" if c.peekIs("user") =>
        c.next()
        val ifExists = c.accept("if") && { c.expect("exists"); true }
        CqlDropRole(roleName(c), ifExists)
      case "list" if c.peekIs("users") =>
        c.next()
        CqlListRoles(None)
      case "alter" if c.peekIs("user") =>
        c.next()
        val name = roleName(c)
        var pw = Option.empty[String]
        if (c.accept("with")) { c.expect("password"); pw = Some(
          parseLiteralToken(c.next())) }
        val su =
          if (c.accept("superuser")) Some(true)
          else if (c.accept("nosuperuser")) Some(false)
          else None
        CqlAlterRole(name, su, None, pw)
      case "create" =>
        c.expect("role")
        val ifNotExists =
          c.accept("if") && { c.expect("not"); c.expect("exists"); true }
        val name = roleName(c)
        // upstream RoleOptions default SUPERUSER and LOGIN to false —
        // only the legacy CREATE USER form defaults LOGIN to true
        var (su, lg, pw) = (false, false, Option.empty[String])
        if (c.accept("with")) {
          var more = true
          while (more) {
            val opt = c.next().toLowerCase
            c.expect("=")
            opt match {
              case "superuser" => su = parseBool(c)
              case "login" => lg = parseBool(c)
              case "password" => pw = Some(parseLiteralToken(c.next()))
              case other => throw new CqlInvalidQueryException(
                s"unknown role option $other")
            }
            more = c.accept("and")
          }
        }
        CqlCreateRole(name, ifNotExists, su, lg, pw)
      case "alter" =>
        c.expect("role")
        val name = roleName(c)
        c.expect("with")
        var (su, lg, pw) = (Option.empty[Boolean], Option.empty[Boolean],
          Option.empty[String])
        var more = true
        while (more) {
          val opt = c.next().toLowerCase
          c.expect("=")
          opt match {
            case "superuser" => su = Some(parseBool(c))
            case "login" => lg = Some(parseBool(c))
            case "password" => pw = Some(parseLiteralToken(c.next()))
            case other => throw new CqlInvalidQueryException(
              s"unknown role option $other")
          }
          more = c.accept("and")
        }
        CqlAlterRole(name, su, lg, pw)
      case "drop" =>
        c.expect("role")
        val ifExists = c.accept("if") && { c.expect("exists"); true }
        CqlDropRole(roleName(c), ifExists)
      case "grant" =>
        // `GRANT <role> TO <role>` (inheritance) vs `GRANT <perms> ON …
        // TO …` — disambiguated by the token after the first name, as
        // upstream's grammar does
        val first = c.next()
        if (c.peekIs("to")) {
          c.next()
          CqlGrantRole(parseLiteralToken(first).toLowerCase, roleName(c))
        } else {
          val perms = parsePermListFrom(first, c)
          c.expect("on")
          val res = parseResource(c)
          c.expect("to")
          CqlGrant(perms, res, roleName(c))
        }
      case "revoke" =>
        val first = c.next()
        if (c.peekIs("from")) {
          c.next()
          CqlRevokeRole(parseLiteralToken(first).toLowerCase, roleName(c))
        } else {
          val perms = parsePermListFrom(first, c)
          c.expect("on")
          val res = parseResource(c)
          c.expect("from")
          CqlRevoke(perms, res, roleName(c))
        }
      case "list" =>
        if (c.peekIs("roles")) {
          c.next()
          val of = if (c.accept("of")) Some(roleName(c)) else None
          CqlListRoles(of)
        } else {
          val perms =
            if (c.accept("all")) {
              // parsePermList consumes its own PERMISSION[S] keyword
              c.accept("permissions"); c.accept("permission"); None
            } else Some(parsePermList(c))
          val on = if (c.accept("on")) Some(parseResource(c)) else None
          val of = if (c.accept("of")) Some(roleName(c)) else None
          c.accept("norecursive") // accepted; listing is always recursive
          CqlListPermissions(perms, on, of)
        }
      case other =>
        throw new CqlInvalidQueryException(s"not an auth statement: $other")
    }
    if (!c.done) throw new CqlInvalidQueryException(
      s"unexpected trailing input near ${c.peek}")
    out
  }

  private val PermissionNames = Set("create", "alter", "drop", "select",
    "modify", "authorize", "describe", "execute",
    // 5.0 dynamic data masking (CEP-20): see clear values / restrict on
    // masked columns
    "unmask", "select_masked")

  /** Builtin masking functions (upstream cql3/functions/masking/ [U]);
    * `MASKED WITH DEFAULT` is sugar for mask_default(). */
  private val MaskFunctions = Set("mask_null", "mask_default",
    "mask_replace", "mask_inner", "mask_outer", "mask_hash")

  /** `MASKED WITH DEFAULT | mask_fn(args…)` after a column declaration;
    * None when the next token is not MASKED. */
  private def parseMaskOpt(c: Cursor): Option[CqlMaskSpec] = {
    if (!c.accept("masked")) return None
    c.expect("with")
    if (c.accept("default")) return Some(CqlMaskSpec("mask_default", Nil))
    val fn = c.next().toLowerCase
    if (!MaskFunctions(fn)) throw new CqlInvalidQueryException(
      s"unknown masking function $fn (builtin mask_* functions only)")
    c.expect("(")
    var args = Vector.empty[Any]
    if (!c.accept(")")) {
      args = args :+ parseLiteral(c)
      while (c.accept(",")) args = args :+ parseLiteral(c)
      c.expect(")")
    }
    Some(CqlMaskSpec(fn, args))
  }

  private def parsePermList(c: Cursor): Seq[String] =
    parsePermListFrom(c.next(), c)

  /** Permission list whose first token the caller already consumed (the
    * GRANT/REVOKE statements read one token ahead to disambiguate the
    * role-inheritance form). */
  private def parsePermListFrom(firstTok: String, c: Cursor): Seq[String] = {
    def oneOf(t: String): String = {
      val p = t.toLowerCase
      if (p == "all") PermissionNames.toSeq.sorted.mkString("+") // marker
      else {
        if (!PermissionNames(p))
          throw new CqlInvalidQueryException(s"unknown permission $p")
        p
      }
    }
    def one(): String = oneOf(c.next())
    val first = oneOf(firstTok)
    if (first.contains("+")) {
      c.accept("permissions"); c.accept("permission")
      PermissionNames.toSeq.sorted
    } else {
      var ps = Seq(first)
      while (c.accept(",")) ps = ps :+ one()
      c.accept("permissions"); c.accept("permission")
      ps
    }
  }

  /** `ALL KEYSPACES | KEYSPACE ks | [TABLE] [ks.]t | ALL ROLES | ROLE r` —
    * a bare table name lands in the flat catalog's user keyspace. */
  private def parseResource(c: Cursor): CqlResource =
    if (c.accept("all")) {
      if (c.accept("keyspaces")) AllKeyspacesRes
      else { c.expect("roles"); AllRolesRes }
    } else if (c.accept("keyspace")) KeyspaceRes(c.next().toLowerCase)
    else if (c.accept("role")) RoleRes(roleName(c))
    else {
      c.accept("table")
      val raw = c.next()
      val name = if (c.accept(".")) s"$raw.${c.next()}" else raw
      name.split("\\.") match {
        // bare: keyspace resolved by the session against its current
        // keyspace (empty-string placeholder, filled in runAuth)
        case Array(t) => TableRes("", t.toLowerCase)
        case Array(ks, t) => TableRes(ks.toLowerCase, t.toLowerCase)
        case _ => throw new CqlInvalidQueryException(
          s"cannot parse table resource $name")
      }
    }

  /** Role names may be bare identifiers or quoted strings. */
  private def roleName(c: Cursor): String =
    parseLiteralToken(c.next()).toLowerCase

  private def parseBool(c: Cursor): Boolean = c.next().toLowerCase match {
    case "true" => true
    case "false" => false
    case other =>
      throw new CqlInvalidQueryException(s"expected true/false, got $other")
  }

  private def parseDdlCursor(c: Cursor,
      udts: Map[String, org.apache.spark.sql.types.StructType]): CqlDdl = {
    c.next().toLowerCase match {
      case "create" =>
        val custom = c.accept("custom")
        if (custom || c.peekIs("index")) return parseCreateIndex(c)
        if (c.peekIs("type")) return parseCreateType(c, udts)
        if (c.peekIs("materialized")) return parseCreateMv(c)
        if (c.accept("trigger")) {
          // `CREATE TRIGGER [IF NOT EXISTS] name ON t USING 'class'`
          // [U cql3/statements/schema/CreateTriggerStatement.java]
          val ifNotExists =
            if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
            else false
          val name = parseLiteralToken(c.next()).toLowerCase
          c.expect("on")
          val table = tableName(c)
          c.expect("using")
          return CqlCreateTrigger(name, table, parseLiteralToken(c.next()),
            ifNotExists)
        }
        val orReplace =
          if (c.peekIs("or")) { c.next(); c.expect("replace"); true }
          else false
        if (c.accept("function"))
          return parseCreateFunction(c, udts, orReplace)
        if (c.accept("aggregate"))
          return parseCreateAggregate(c, udts, orReplace)
        if (orReplace) throw new CqlInvalidQueryException(
          "OR REPLACE applies only to CREATE FUNCTION / CREATE AGGREGATE")
        if (c.accept("keyspace")) {
          val ifNotExists =
            if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
            else false
          val name = c.next()
          // the WITH clause is grammar-mandatory upstream (Cql.g:
          // createKeyspaceStatement) and `replication` is the mandatory
          // option [U cql3/statements/schema/CreateKeyspaceStatement]
          if (!c.accept("with")) throw new CqlInvalidQueryException(
            s"CREATE KEYSPACE $name expects a WITH options clause")
          val (repl, durable) = parseKeyspaceOptions(c)
          return CqlCreateKeyspace(name, ifNotExists,
            repl.getOrElse(throw new CqlInvalidQueryException(
              s"Missing mandatory option 'replication' for keyspace $name")),
            durable.getOrElse(true))
        }
        c.expect("table")
        val ifNotExists =
          if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
          else false
        val table = tableName(c)
        c.expect("(")
        var cols = Vector.empty[CqlColumnDef]
        var pk = Seq.empty[String]
        var ck = Seq.empty[String]
        var first = true
        while (!c.accept(")")) {
          if (!first) c.expect(",")
          first = false
          if (c.peekIs("primary")) { // PRIMARY KEY ((pk…), ck…) | (pk, ck…)
            c.next(); c.expect("key"); c.expect("(")
            if (c.accept("(")) { pk = parseIdentList(c); c.expect(")") }
            else pk = Seq(c.next())
            while (c.accept(",")) ck = ck :+ c.next()
            c.expect(")")
          } else {
            val name = c.next()
            val isCounter = c.peekIs("counter")
            val refs = scala.collection.mutable.Set.empty[String]
            val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
            val dt = parseType(c, udts, refs, dims)
            // MASKED WITH and STATIC in either order (upstream grammar
            // puts MASKED first; dumps in the wild vary)
            val maskFirst = parseMaskOpt(c)
            val static = c.accept("static")
            val mask = maskFirst.orElse(parseMaskOpt(c))
            if (c.accept("primary")) { c.expect("key"); pk = Seq(name) }
            cols = cols :+ CqlColumnDef(name, dt, static, isCounter,
              refs.toSet, dims.headOption, mask)
          }
        }
        // WITH options: CLUSTERING ORDER and default_time_to_live carry
        // semantics; everything else (compaction, caching, replication-era
        // knobs) is parsed and discarded — single-engine semantics
        var ckDesc = Seq.empty[(String, Boolean)]
        var defaultTtl: Option[Long] = None
        var cdc = false
        if (c.accept("with")) {
          var more = true
          while (more && !c.done) {
            if (c.accept("clustering")) {
              c.expect("order"); c.expect("by"); c.expect("(")
              def one() = {
                val n = c.next()
                val d = if (c.accept("desc")) true else { c.accept("asc"); false }
                (n, d)
              }
              ckDesc = Seq(one())
              while (c.accept(",")) ckDesc = ckDesc :+ one()
              c.expect(")")
            } else {
              // lenient option consumption: real DESCRIBE dumps carry
              // `COMPACT STORAGE` (bare keywords), `ID = <uuid>` (multi-
              // token values), map literals, scientific notation — consume
              // everything up to the next top-level AND, capturing only
              // the options that carry single-engine semantics
              val key = c.next()
              val toks = consumeOptionValue(c)
              if (key.equalsIgnoreCase("default_time_to_live"))
                defaultTtl = Some(ttlOptionValue(toks))
              // `WITH cdc = true` (4.0 change-data-capture [U
              // TableParams.cdc]): mutations also land in the table's
              // cdc_raw analogue for a streaming consumer
              else if (key.equalsIgnoreCase("cdc"))
                cdc = boolOptionValue("cdc", toks)
            }
            more = c.accept("and")
          }
          if (!c.done) throw new CqlInvalidQueryException(
            s"unexpected table option near ${c.peek}")
        }
        if (pk.isEmpty) throw new CqlInvalidQueryException(
          s"CREATE TABLE $table: no PRIMARY KEY")
        CqlCreateTable(table, cols, pk, ck, ifNotExists, ckDesc, defaultTtl,
          cdc)
      case "drop" =>
        if (c.accept("index")) {
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          // `DROP INDEX [ks.]name` — the qualifier survives to the
          // session, which resolves bare names against its current
          // keyspace (index names scope per keyspace, as upstream)
          CqlDropIndex(tableName(c), ifExists)
        } else if (c.accept("trigger")) {
          // `DROP TRIGGER [IF EXISTS] name ON t`
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          val name = parseLiteralToken(c.next()).toLowerCase
          c.expect("on")
          CqlDropTrigger(name, tableName(c), ifExists)
        } else if (c.accept("materialized")) {
          c.expect("view")
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          CqlDropMv(tableName(c), ifExists)
        } else if (c.accept("type")) {
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          CqlDropType(tableName(c), ifExists)
        } else if (c.accept("keyspace")) {
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          CqlDropKeyspace(c.next(), ifExists)
        } else if (c.accept("function")) {
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          CqlDropFunction(tableName(c), ifExists)
        } else if (c.accept("aggregate")) {
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          CqlDropAggregate(tableName(c), ifExists)
        } else {
          c.expect("table")
          val ifExists = if (c.accept("if")) { c.expect("exists"); true } else false
          CqlDropTable(tableName(c), ifExists)
        }
      case "alter" =>
        if (c.accept("type")) { // ALTER TYPE name ADD field type[, …]
          import org.apache.spark.sql.types.{StructField, StructType}
          val name = tableName(c)
          c.expect("add")
          val refs = scala.collection.mutable.Set.empty[String]
          def one() = { val n = c.next(); StructField(n, parseType(c, udts, refs)) }
          var fs = Vector(one())
          while (c.accept(",")) fs = fs :+ one()
          return CqlAlterTypeAdd(name, StructType(fs), refs.toSet)
        }
        if (c.accept("keyspace")) {
          val name = c.next()
          if (!c.accept("with")) throw new CqlInvalidQueryException(
            "ALTER KEYSPACE expects a WITH options clause")
          val (repl, durable) = parseKeyspaceOptions(c)
          return CqlAlterKeyspace(name, repl, durable)
        }
        c.expect("table")
        val table = tableName(c)
        if (c.accept("add")) {
          val paren = c.accept("(")
          def one(): CqlColumnDef = {
            val n = c.next()
            val isCounter = c.peekIs("counter")
            val refs = scala.collection.mutable.Set.empty[String]
            val dims = scala.collection.mutable.ArrayBuffer.empty[Int]
            val dt = parseType(c, udts, refs, dims)
            val maskFirst = parseMaskOpt(c)
            val static = c.accept("static")
            CqlColumnDef(n, dt, static, isCounter, refs.toSet,
              dims.headOption, maskFirst.orElse(parseMaskOpt(c)))
          }
          var cols = Vector(one())
          while (c.accept(",")) cols = cols :+ one()
          if (paren) c.expect(")")
          CqlAlterAdd(table, cols)
        } else if (c.accept("drop")) {
          val paren = c.accept("(")
          var cols = Vector(c.next())
          while (c.accept(",")) cols = cols :+ c.next()
          if (paren) c.expect(")")
          CqlAlterDrop(table, cols)
        } else if (c.accept("alter")) {
          // `ALTER c MASKED WITH fn(args)` / `ALTER c DROP MASKED` — the
          // 5.0 DDM mask lifecycle [U AlterTableStatement.MaskColumn]
          // (the pre-3.x `ALTER c TYPE t` form was removed upstream)
          val column = c.next()
          if (c.accept("drop")) {
            c.expect("masked")
            CqlAlterMask(table, column, None)
          } else parseMaskOpt(c) match {
            case some @ Some(_) => CqlAlterMask(table, column, some)
            case None => throw new CqlInvalidQueryException(
              s"ALTER $column expects MASKED WITH … or DROP MASKED")
          }
        } else if (c.accept("rename")) {
          // `RENAME a TO b [AND c TO d …]` — upstream restricts renames to
          // PRIMARY KEY columns [U cql3/statements/schema/AlterTableStatement]
          def one(): (String, String) = {
            val from = c.next(); c.expect("to"); (from, c.next())
          }
          var pairs = Vector(one())
          while (c.accept("and")) pairs = pairs :+ one()
          CqlAlterRename(table, pairs)
        } else if (c.accept("with")) {
          // table-options form: same lenient consumption as CREATE TABLE —
          // only default_time_to_live carries single-engine semantics
          var dttl: Option[Option[Long]] = None
          var cdc: Option[Boolean] = None
          var more = true
          while (more && !c.done) {
            val key = c.next()
            if (key.equalsIgnoreCase("clustering"))
              throw new CqlInvalidQueryException(
                "Cannot alter CLUSTERING ORDER") // fixed at creation [U]
            val toks = consumeOptionValue(c)
            if (key.equalsIgnoreCase("default_time_to_live")) {
              val v = ttlOptionValue(toks)
              dttl = Some(if (v > 0) Some(v) else None)
            } else if (key.equalsIgnoreCase("cdc"))
              cdc = Some(boolOptionValue("cdc", toks))
            more = c.accept("and")
          }
          CqlAlterOptions(table, dttl, cdc)
        } else throw new CqlInvalidQueryException(
          s"ALTER TABLE supports ADD, DROP, RENAME and WITH, got ${c.peek}")
      case "truncate" =>
        c.accept("table")
        CqlTruncate(tableName(c))
      case other =>
        throw new CqlInvalidQueryException(s"not a DDL statement: $other")
    }
  }

  /** `CREATE MATERIALIZED VIEW [IF NOT EXISTS] name AS SELECT … FROM base
    * [WHERE …] PRIMARY KEY ((pk…)[, ck…])` (upstream
    * `cql3/statements/schema/CreateViewStatement` [U]). The inner SELECT is
    * the ordinary grammar; the cursor stops at `PRIMARY KEY`, which this
    * wrapper owns. `WITH …` options accepted and ignored. */
  private def parseCreateMv(c: Cursor): CqlDdl = {
    c.expect("materialized"); c.expect("view")
    val ifNotExists =
      if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
      else false
    val name = tableName(c)
    c.expect("as")
    val sel = parseSelectCursor(c)
    c.expect("primary"); c.expect("key"); c.expect("(")
    var pk = Seq.empty[String]
    var ck = Seq.empty[String]
    if (c.accept("(")) { pk = parseIdentList(c); c.expect(")") }
    else pk = Seq(c.next())
    while (c.accept(",")) ck = ck :+ c.next()
    c.expect(")")
    if (c.accept("with")) while (!c.done) c.next() // options ignored
    CqlCreateMv(name, sel, pk, ck, ifNotExists)
  }

  /** `CREATE TYPE [IF NOT EXISTS] name (field type, …)` (upstream
    * `cql3/statements/schema/CreateTypeStatement` [U]) — resolved to a
    * StructType at parse time, so fields may reference earlier UDTs. */
  private def parseCreateType(c: Cursor,
      udts: Map[String, org.apache.spark.sql.types.StructType]): CqlDdl = {
    import org.apache.spark.sql.types.{StructField, StructType}
    c.expect("type")
    val ifNotExists =
      if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
      else false
    val name = tableName(c)
    c.expect("(")
    val refs = scala.collection.mutable.Set.empty[String]
    def one() = { val n = c.next(); StructField(n, parseType(c, udts, refs)) }
    var fields = Vector(one())
    while (c.accept(",")) fields = fields :+ one()
    c.expect(")")
    CqlCreateType(name, StructType(fields), ifNotExists, refs.toSet)
  }

  /** `CREATE [OR REPLACE] FUNCTION [IF NOT EXISTS] name (arg type, …)
    * (CALLED | RETURNS NULL) ON NULL INPUT RETURNS type LANGUAGE lang
    * AS 'body'` (upstream `cql3/functions/UDFunction` /
    * `CreateFunctionStatement` [U]). The full DDL shape parses; execution
    * binds expression bodies (see CqlSession — the sandboxed JVM compile
    * is out of scope). */
  private def parseCreateFunction(c: Cursor,
      udts: Map[String, org.apache.spark.sql.types.StructType],
      orReplace: Boolean): CqlDdl = {
    val ifNotExists =
      if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
      else false
    if (orReplace && ifNotExists)
      throw new CqlInvalidQueryException( // upstream rejects the combination
        "Cannot use both OR REPLACE and IF NOT EXISTS")
    val name = tableName(c)
    c.expect("(")
    var args = Vector.empty[(String, org.apache.spark.sql.types.DataType)]
    if (!c.accept(")")) {
      def one() = { val n = c.next(); (n, parseType(c, udts)) }
      args = args :+ one()
      while (c.accept(",")) args = args :+ one()
      c.expect(")")
    }
    val calledOnNull =
      if (c.accept("called")) {
        c.expect("on"); c.expect("null"); c.expect("input"); true
      } else {
        c.expect("returns"); c.expect("null")
        c.expect("on"); c.expect("null"); c.expect("input"); false
      }
    c.expect("returns")
    val rt = parseType(c, udts)
    c.expect("language")
    val lang = c.next().toLowerCase
    c.expect("as")
    val body = parseLiteral(c) match {
      case s: String => s
      case other => throw new CqlInvalidQueryException(
        s"function body must be a string literal, got $other")
    }
    CqlCreateFunction(name, args, calledOnNull, rt, lang, body,
      orReplace, ifNotExists)
  }

  /** `CREATE [OR REPLACE] AGGREGATE [IF NOT EXISTS] name (type, …)
    * SFUNC f STYPE type [FINALFUNC g] [INITCOND literal]` (upstream
    * `cql3/functions/UDAggregate` [U]). */
  private def parseCreateAggregate(c: Cursor,
      udts: Map[String, org.apache.spark.sql.types.StructType],
      orReplace: Boolean): CqlDdl = {
    val ifNotExists =
      if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
      else false
    if (orReplace && ifNotExists)
      throw new CqlInvalidQueryException(
        "Cannot use both OR REPLACE and IF NOT EXISTS")
    val name = tableName(c)
    c.expect("(")
    var argTypes = Vector.empty[org.apache.spark.sql.types.DataType]
    if (!c.accept(")")) {
      argTypes = argTypes :+ parseType(c, udts)
      while (c.accept(",")) argTypes = argTypes :+ parseType(c, udts)
      c.expect(")")
    }
    c.expect("sfunc")
    val sfunc = tableName(c)
    c.expect("stype")
    val stype = parseType(c, udts)
    var finalFunc: Option[String] = None
    var initCond: Option[Any] = None
    var more = true
    while (more) {
      if (c.accept("finalfunc")) finalFunc = Some(tableName(c))
      else if (c.accept("initcond")) initCond = Some(parseValue(c))
      else more = false
    }
    CqlCreateAggregate(name, argTypes, sfunc, stype, finalFunc, initCond,
      orReplace, ifNotExists)
  }

  /** `CREATE [CUSTOM] INDEX [IF NOT EXISTS] [name] ON t(col)
    * [USING 'class'] [WITH OPTIONS = {…}]` (upstream
    * `cql3/statements/schema/CreateIndexStatement` [U]). The index class
    * decides range capability: SAI/SASI classes (and the 5.0 shorthand
    * `USING 'sai'`) serve range predicates; anything else is legacy-2i
    * equality. Collection targets `KEYS/VALUES/ENTRIES/FULL(col)` carry
    * through as the index target — they decide which predicate the index
    * serves. `WITH OPTIONS` is accepted and ignored. */
  private def parseCreateIndex(c: Cursor): CqlDdl = {
    c.expect("index")
    val ifNotExists =
      if (c.accept("if")) { c.expect("not"); c.expect("exists"); true }
      else false
    val name = if (c.peekIs("on")) None else Some(c.next())
    c.expect("on")
    val table = tableName(c)
    c.expect("(")
    val wrapped = Seq("keys", "values", "entries", "full")
      .exists(w => c.peek.equalsIgnoreCase(w))
    val (target, column) =
      if (wrapped && c.peekAt(1) == "(") {
        val w = c.next().toLowerCase
        c.expect("("); val x = c.next(); c.expect(")")
        (w, x)
      } else ("", c.next())
    c.expect(")")
    var sai = false
    if (c.accept("using")) {
      val cls = c.next().stripPrefix("'").stripSuffix("'").toLowerCase
      sai = cls == "sai" || cls.contains("storageattachedindex") ||
        cls.contains("sasi")
    }
    var options = Map.empty[String, String]
    if (c.accept("with")) {
      // `WITH OPTIONS = {'k': 'v', …}` — capture the string map; only
      // similarity_function carries engine semantics (5.0 vector SAI
      // [U index/sai/disk/v1/SegmentBuilder, VectorType similarity]),
      // the rest (analyzers, case_sensitive, …) are accepted-and-kept
      // for DESCRIBE fidelity
      c.expect("options"); c.expect("="); c.expect("{")
      var more = !c.peekIs("}")
      while (more) {
        val k = parseLiteralToken(c.next()).toLowerCase
        c.expect(":")
        val v = parseLiteralToken(c.next())
        options += (k -> v)
        more = c.accept(",")
      }
      c.expect("}")
    }
    CqlCreateIndex(name, table, column, sai, ifNotExists, target, options)
  }

  /** CQL `duration` as a Spark struct — upstream's (months, days, nanos)
    * triple [U db/marshal/DurationType.java, cql3/Duration.java]: calendar
    * months and days don't reduce to nanos, so the three components stay
    * separate and the type is NOT orderable (rejected in PRIMARY KEY and
    * slice restrictions). */
  val DurationType: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("months",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("days",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("nanos",
        org.apache.spark.sql.types.LongType)))

  private val durStdRe = "(?i)((\\d+)(y|mo|w|d|h|ms|us|ns|m|s))+".r
  private val durPartRe = "(?i)(\\d+)(y|mo|w|d|h|ms|us|ns|m|s)".r
  private val durIsoRe =
    ("(?i)P(?:(\\d+)Y)?(?:(\\d+)M)?(?:(\\d+)W)?(?:(\\d+)D)?" +
      "(?:T(?:(\\d+)H)?(?:(\\d+)M)?(?:(\\d+)S)?)?").r

  /** Is `s` a complete duration literal (standard `1mo2d3h` or ISO-8601
    * `P1Y2M3DT4H5M6S`)? */
  private[cql] def isDurationLiteral(s: String): Boolean =
    durStdRe.matches(s) || (durIsoRe.matches(s) && s.length > 1)

  /** Parse a duration literal to upstream's (months, days, nanos) triple,
    * with exact arithmetic (overflow → rejection, never a wrapped value). */
  private[cql] def parseDuration(s: String): CqlDuration = try {
    var months = 0L; var days = 0L; var nanos = 0L
    def add(q: Long, unit: String): Unit = unit.toLowerCase match {
      case "y" => months = Math.addExact(months, Math.multiplyExact(q, 12L))
      case "mo" => months = Math.addExact(months, q)
      case "w" => days = Math.addExact(days, Math.multiplyExact(q, 7L))
      case "d" => days = Math.addExact(days, q)
      case "h" =>
        nanos = Math.addExact(nanos, Math.multiplyExact(q, 3600000000000L))
      case "m" =>
        nanos = Math.addExact(nanos, Math.multiplyExact(q, 60000000000L))
      case "s" =>
        nanos = Math.addExact(nanos, Math.multiplyExact(q, 1000000000L))
      case "ms" => nanos = Math.addExact(nanos, Math.multiplyExact(q, 1000000L))
      case "us" => nanos = Math.addExact(nanos, Math.multiplyExact(q, 1000L))
      case "ns" => nanos = Math.addExact(nanos, q)
    }
    if (durStdRe.matches(s))
      durPartRe.findAllMatchIn(s).foreach(m => add(m.group(1).toLong, m.group(2)))
    else durIsoRe.findFirstMatchIn(s) match {
      case Some(m) if durIsoRe.matches(s) =>
        Seq("y", "mo", "w", "d", "h", "m", "s").zipWithIndex.foreach {
          case (u, i) => Option(m.group(i + 1)).foreach(q => add(q.toLong, u))
        }
      case _ => throw new CqlInvalidQueryException(s"invalid duration $s")
    }
    if (months > Int.MaxValue || days > Int.MaxValue)
      throw new ArithmeticException("overflow")
    CqlDuration(months.toInt, days.toInt, nanos)
  } catch {
    case _: ArithmeticException | _: NumberFormatException =>
      throw new CqlInvalidQueryException(s"duration $s overflows")
  }

  /** CQL type → Spark type. `counter` is a bigint (the increment-log model
    * sums it); `decimal`/`varint` map to bounded decimals; `uuid`/`inet`
    * are strings; `vector<float, n>` is `array<float>`; `frozen<T>` = T. */
  private def parseType(c: Cursor,
      udts: Map[String, org.apache.spark.sql.types.StructType] = Map.empty,
      refs: scala.collection.mutable.Set[String] =
        scala.collection.mutable.Set.empty,
      /** receives every `vector<T, n>` dimension seen (outermost first) —
        * the column-def site keeps the first for declared-dim tracking */
      dims: scala.collection.mutable.ArrayBuffer[Int] =
        scala.collection.mutable.ArrayBuffer.empty,
      /** nesting depth — a dim is recorded only for the TOP-LEVEL vector
        * (frozen<> is transparent); a vector inside list/set/map/tuple is
        * not the column's declared dimension */
      depth: Int = 0
  ): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    c.next().toLowerCase match {
      case "int" => IntegerType
      case "bigint" | "counter" | "time" => LongType
      case "smallint" => ShortType
      case "tinyint" => ByteType
      case "text" | "varchar" | "ascii" | "uuid" | "timeuuid" | "inet" => StringType
      case "double" => DoubleType
      case "float" => FloatType
      case "boolean" => BooleanType
      case "timestamp" => TimestampType
      case "date" => DateType
      case "decimal" => DecimalType(38, 18)
      case "varint" => DecimalType(38, 0)
      case "blob" => BinaryType
      case "duration" => CqlParser.DurationType
      case "frozen" => // transparent for dim purposes: frozen<vector<…>>
        c.expect("<"); val t = parseType(c, udts, refs, dims, depth)
        c.expect(">"); t
      case "list" =>
        c.expect("<"); val t = parseType(c, udts, refs, dims, depth + 1)
        c.expect(">"); ArrayType(t)
      case "set" =>
        c.expect("<"); val t = parseType(c, udts, refs, dims, depth + 1)
        c.expect(">"); ArrayType(t)
      case "map" =>
        c.expect("<"); val k = parseType(c, udts, refs, dims, depth + 1)
        c.expect(",")
        val v = parseType(c, udts, refs, dims, depth + 1)
        c.expect(">"); MapType(k, v)
      case "vector" =>
        c.expect("<"); val t = parseType(c, udts, refs, dims, depth + 1)
        c.expect(",")
        val rawDim = c.next()
        val dim = try rawDim.toInt catch { case _: NumberFormatException =>
          throw new CqlInvalidQueryException(
            s"vector dimension must be a positive integer, got $rawDim") }
        if (dim <= 0) throw new CqlInvalidQueryException(
          s"vector dimension must be a positive integer, got $dim")
        if (depth == 0) dims += dim
        c.expect(">"); ArrayType(t)
      case other =>
        // UDT reference, optionally keyspace-qualified (`ks.type`); the
        // name is recorded AS WRITTEN — the session canonicalizes it
        // against its current keyspace at the statement boundary
        val name = if (c.accept(".")) s"$other.${c.next().toLowerCase}"
          else other
        val st = udts.getOrElse(name,
          throw new CqlInvalidQueryException(s"unknown type $name"))
        refs += name // record the NAME binding: identically-shaped distinct
        st          // UDTs must not be conflated by structural equality
    }
  }

  /** LWT condition suffix: `IF NOT EXISTS` | `IF EXISTS` | `IF c op v
    * [AND …]` (upstream `cql3/conditions/ColumnCondition.java` [U]). */
  private def parseCondition(c: Cursor): Option[CqlCondition] =
    if (!c.accept("if")) None
    else if (c.accept("not")) { c.expect("exists"); Some(IfNotExists) }
    else if (c.accept("exists")) Some(IfExists)
    else {
      def one(): (String, Option[Any], String, Any) = {
        val col = c.next()
        // collection-element / UDT-field condition targets (upstream
        // ColumnCondition on `l[i]` / `m[k]` / `u.f` [U])
        val sub: Option[Any] =
          if (c.accept("[")) { val k = parseLiteral(c); c.expect("]"); Some(k) }
          else if (c.accept(".")) Some(CqlFieldSub(c.next()))
          else None
        if (c.accept("in")) {
          c.expect("(")
          val vals =
            if (c.accept(")")) Seq.empty[Any]
            else {
              var vs = Seq(parseLiteral(c))
              while (c.accept(",")) vs = vs :+ parseLiteral(c)
              c.expect(")")
              vs
            }
          (col, sub, "in", vals)
        } else if (c.accept("contains")) {
          if (sub.isDefined) throw new CqlInvalidQueryException(
            "CONTAINS conditions do not take element subscripts")
          if (c.accept("key")) (col, sub, "contains key", parseLiteral(c))
          else (col, sub, "contains", parseLiteral(c))
        } else {
          val op = c.next() match {
            case o @ ("=" | "!=" | "<" | "<=" | ">" | ">=") => o
            case o => throw new CqlInvalidQueryException(
              s"unsupported condition operator $o")
          }
          (col, sub, op, parseTerm(c))
        }
      }
      var ps = Seq(one())
      while (c.accept("and")) ps = ps :+ one()
      Some(IfColumns(ps))
    }

  private def parseKeyPredicates(c: Cursor): Seq[(String, Any)] = {
    def one(): (String, Any) = {
      val col = c.next()
      if (c.accept("in")) { // multi-key write: expands at apply time
        c.expect("(")
        var vs = Seq.empty[Any]
        if (!c.accept(")")) {
          vs = Seq(parseLiteral(c))
          while (c.accept(",")) vs = vs :+ parseLiteral(c)
          c.expect(")")
        }
        col -> CqlInList(vs)
      } else { c.expect("="); col -> parseLiteral(c) }
    }
    var out = Seq(one()) // key restrictions are `col = lit` or `col IN (…)`
    while (c.accept("and")) out = out :+ one()
    out
  }

  private def parseUsing(c: Cursor): (Option[Any], Option[Any]) = {
    var ts: Option[Any] = None
    var ttl: Option[Any] = None
    def operand(): Any = // a long literal or a ?/:name bind marker
      if (c.peekIs("?") || c.peekIs(":")) parseLiteral(c) else longLiteral(c)
    if (c.accept("using")) {
      def one(): Unit =
        if (c.accept("timestamp")) ts = Some(operand())
        else if (c.accept("ttl")) ttl = Some(operand())
        else throw new CqlInvalidQueryException(s"expected TIMESTAMP or TTL near ${c.peek}")
      one()
      while (c.accept("and")) one()
    }
    (ts, ttl)
  }

  /** One `WITH key = <value>` option value: everything up to the next
    * top-level AND, tracking {}/() nesting (real DESCRIBE dumps carry map
    * literals, multi-token IDs, scientific notation). Shared by CREATE
    * TABLE and ALTER TABLE … WITH so the lenient-consumption rules cannot
    * drift between the two DDL forms. */
  /** `replication = {'class': …} [AND durable_writes = b] [AND …]` —
    * the keyspace option clause; unknown options (graph_engine etc.)
    * consume and discard, as the table-option path does. */
  private def parseKeyspaceOptions(
      c: Cursor): (Option[Map[String, String]], Option[Boolean]) = {
    var repl: Option[Map[String, String]] = None
    var durable: Option[Boolean] = None
    var more = true
    while (more && !c.done) {
      val key = c.next().toLowerCase
      key match {
        case "replication" =>
          c.expect("="); repl = Some(parseOptionMap(c))
        case "durable_writes" =>
          c.expect("=")
          durable = Some(
            c.next().stripPrefix("'").stripSuffix("'").toLowerCase match {
              case "true" => true
              case "false" => false
              case other => throw new CqlInvalidQueryException(
                s"durable_writes must be true or false, got $other")
            })
        case _ => consumeOptionValue(c)
      }
      more = c.accept("and")
    }
    if (!c.done) throw new CqlInvalidQueryException(
      s"unexpected keyspace option near ${c.peek}")
    (repl, durable)
  }

  /** `{'k': 'v', …}` option-map literal (string keys, scalar values). */
  private def parseOptionMap(c: Cursor): Map[String, String] = {
    def strip(t: String) = t.stripPrefix("'").stripSuffix("'")
    c.expect("{")
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    if (!c.peekIs("}")) {
      def one(): Unit = {
        val k = strip(c.next()); c.expect(":"); m(k) = strip(c.next())
      }
      one()
      while (c.accept(",")) one()
    }
    c.expect("}")
    m.toMap
  }

  private def consumeOptionValue(c: Cursor): Seq[String] = {
    val toks = scala.collection.mutable.Buffer.empty[String]
    var depth = 0
    while (!c.done && (depth > 0 || !c.peekIs("and"))) {
      val t = c.next()
      if (t == "{" || t == "(") depth += 1
      else if (t == "}" || t == ")") depth -= 1
      toks += t
    }
    toks.toSeq
  }

  /** `default_time_to_live = n` — the one option with engine semantics. */
  private def ttlOptionValue(toks: Seq[String]): Long = toks match {
    case Seq("=", v) if v.nonEmpty && v.forall(_.isDigit) => v.toLong
    case _ => throw new CqlInvalidQueryException(
      s"invalid default_time_to_live: ${toks.mkString(" ")}")
  }

  /** Boolean table option (`cdc = true|false`). */
  private def boolOptionValue(name: String, toks: Seq[String]): Boolean =
    toks match {
      case Seq("=", v) if v.equalsIgnoreCase("true") => true
      case Seq("=", v) if v.equalsIgnoreCase("false") => false
      case _ => throw new CqlInvalidQueryException(
        s"invalid $name: ${toks.mkString(" ")} (expected true or false)")
    }

  private def parseSelectors(c: Cursor): Seq[CqlSelector] = {
    var out = Seq(parseSelector(c))
    while (c.accept(",")) out = out :+ parseSelector(c)
    // `SELECT *, c` is a syntax error upstream (Cql.g: star OR a selector
    // list) — and letting it through would bypass the engine's metadata-
    // column filter on the star expansion
    if (out.contains(Star) && out.lengthCompare(1) > 0)
      throw new CqlInvalidQueryException(
        "'*' cannot be combined with other selectors")
    out
  }

  private def parseSelector(c: Cursor): CqlSelector = {
    if (c.accept("*")) return Star
    // arithmetic-leading selector: a numeric literal, parenthesized
    // expression, or unary minus can only start an operator expression
    // (CASSANDRA-11935) — a bare column lands here too when an operator
    // follows it (handled at the tail of this method)
    if (c.peek == "(" || c.peek == "-" ||
        c.peek.headOption.exists(_.isDigit)) {
      val e = parseArith(c)
      return ArithSelector(e, renderArith(e), parseAlias(c))
    }
    val name0 = c.next()
    // `ks.fn(args)` — a keyspace-qualified function INVOCATION; told
    // apart from UDT field access `col.field` by the "(" that follows
    val name =
      if (c.peek == "." && c.peekAt(2) == "(") {
        c.next(); s"$name0.${c.next()}"
      } else name0
    if (name.equalsIgnoreCase("cast") && c.peekIs("(")) {
      // CAST(col AS cqltype) — type names are CQL's, mapped by parseType
      c.expect("("); val column = c.next(); c.expect("as")
      val typeName = c.peek
      val dt = parseType(c)
      c.expect(")")
      return CastSelector(column, dt, typeName.toLowerCase, parseAlias(c))
    }
    if (c.accept("(")) {
      if (name.equalsIgnoreCase("floor")) { // floor(ts, <duration>)
        val colName = c.next(); c.expect(",")
        val us = parseDurationMicros(c); c.expect(")")
        return FunctionSelector("floor",
          Seq(ColArg(colName), LitArg(us)), parseAlias(c))
      }
      val args = parseFnArgs(c)
      val fs = FunctionSelector(name, args, None)
      if (isArithOp(c.peek)) {
        // `count(*) + 1`, `sum(q) / count(*)` — the call is the left
        // operand of an operator expression
        val e = parseArithTail(ArithFn(fs), c, 1)
        ArithSelector(e, renderArith(e), parseAlias(c))
      } else fs.copy(alias = parseAlias(c))
    } else if (c.peek == "." && c.peekAt(1).headOption.exists(h =>
        h.isLetter || h == '_')) {
      // UDT field access `col.field` (upstream `cql3/selection/
      // FieldSelector` [U]) — Spark resolves the dotted path as nested
      // struct access; default result name keeps the full path.
      c.next(); val sub = c.next()
      val path = s"$name.$sub"
      ColumnSelector(path, parseAlias(c).orElse(Some(path)))
    } else if (isArithOp(c.peek)) {
      // the parsed name is the left operand of an operator expression
      val e = parseArithTail(ArithCol(name), c, 1)
      ArithSelector(e, renderArith(e), parseAlias(c))
    } else ColumnSelector(name, parseAlias(c))
  }

  /** Function-call arguments after the opening paren is consumed —
    * shared by the selector grammar and arithmetic primaries. */
  private def parseFnArgs(c: Cursor): Vector[CqlFnArg] = {
    var args = Vector.empty[CqlFnArg]
    if (!c.accept(")")) {
      def one(): CqlFnArg =
        if (c.peekIs("*")) { c.next(); ColArg("*") }
        else {
          val t = c.peek
          val isLit = t.startsWith("'") || t == "[" || t == "{" ||
            t.headOption.exists(_.isDigit) ||
            t == "-" || // unary minus is its own token; parseValue folds it
            t.equalsIgnoreCase("true") || t.equalsIgnoreCase("false") ||
            t.equalsIgnoreCase("null") ||
            (literalFns(t.toLowerCase) && c.peekAt(1) == "(") // nested fn
          if (isLit) LitArg(parseValue(c)) else ColArg(c.next())
        }
      args = args :+ one()
      while (c.accept(",")) args = args :+ one()
      c.expect(")")
    }
    args
  }

  // ---- Cassandra 4.0 operator expressions (precedence climbing) ----

  private def isArithOp(t: String): Boolean =
    t == "+" || t == "-" || t == "*" || t == "/" || t == "%"
  private def arithPrec(op: String): Int =
    if (op == "+" || op == "-") 1 else 2

  private def parseArithPrimary(c: Cursor): CqlArith = {
    if (c.accept("(")) { val e = parseArith(c); c.expect(")"); return e }
    if (c.accept("-")) return ArithNeg(parseArithPrimary(c))
    val t = c.peek
    // literal operands — numbers, DURATIONS (`12h`, `1mo`, ISO `P1D`),
    // quoted timestamp strings — all share parseLiteral's grammar
    // (including the "12"+"h30m" duration token re-join)
    if (t.headOption.exists(_.isDigit) || t.startsWith("'") ||
        isDurationLiteral(t))
      ArithLit(parseLiteral(c))
    else {
      val n = c.next()
      if (n.isEmpty || !n.headOption.exists(h => h.isLetter || h == '_'))
        throw new CqlInvalidQueryException(
          s"operator expression expects a column or literal, got '$n'")
      if (c.accept("(")) ArithFn(FunctionSelector(n, parseFnArgs(c), None))
      else ArithCol(n)
    }
  }

  private def parseArith(c: Cursor): CqlArith =
    parseArithTail(parseArithPrimary(c), c, 1)

  private def parseArithTail(left0: CqlArith, c: Cursor,
      minPrec: Int): CqlArith = {
    var left = left0
    while (isArithOp(c.peek) && arithPrec(c.peek) >= minPrec) {
      val op = c.next()
      val right = parseArithTail(parseArithPrimary(c), c, arithPrec(op) + 1)
      left = ArithBin(op, left, right)
    }
    left
  }

  /** Upstream-style default result name (`a + b`); nested operands render
    * parenthesized so the name is unambiguous regardless of source parens. */
  private def renderArith(e: CqlArith): String = e match {
    case ArithCol(n) => n
    case ArithLit(v) => v.toString
    case ArithFn(f) =>
      s"${f.fn.toLowerCase}(" + f.args.map {
        case ColArg(n) => n
        case LitArg(v) => v.toString
      }.mkString(", ") + ")"
    case ArithNeg(i) => s"-${renderArith(i)}"
    case ArithBin(op, l, r) =>
      def side(x: CqlArith) = x match {
        case b: ArithBin => s"(${renderArith(b)})"
        case other => renderArith(other)
      }
      s"${side(l)} $op ${side(r)}"
  }

  private def parseAlias(c: Cursor): Option[String] =
    if (c.accept("as")) Some(c.next()) else None

  private def parseIdentList(c: Cursor): Seq[String] = {
    var out = Seq(c.next())
    while (c.accept(",")) out = out :+ c.next()
    out
  }

  private def parseOrderBy(c: Cursor): OrderBy =
    orderByDirection(c, c.next())

  /** Direction suffix for an already-consumed ORDER BY column (the SELECT
    * grammar's ANN lookahead reads the first column before knowing which
    * branch it is in — one shared direction parse, no drift). */
  private def orderByDirection(c: Cursor, col: String): OrderBy = {
    val asc = if (c.accept("desc")) false else { c.accept("asc"); true }
    OrderBy(col, asc)
  }

  /** WHERE grammar with Cassandra 5.0 disjunctions (CEP-29): `or :=
    * and (OR and)*`, `and := unit (AND unit)*`, `unit := '(' or ')' |
    * predicate`. AND binds tighter than OR. Returns the historical
    * conjunction list; any disjunction collapses into one [[OrPredicate]]
    * element so pure-AND statements keep their exact old AST. */
  private def parseWhereExpr(c: Cursor): Seq[CqlPredicate] = {
    // '(' is ambiguous: a boolean group `(a = 1 OR …)` vs a multi-column
    // relation `(ck1, ck2) >= (1, 2)`. A tuple's first identifier is
    // always followed by ',' or ')'; a grouped predicate's identifier is
    // followed by its operator (or '[' / '(' for entry and token forms).
    def isBooleanGroup: Boolean =
      c.peekAt(1) == "(" || !(c.peekAt(2) == "," || c.peekAt(2) == ")")
    def unit(): Seq[CqlPredicate] =
      if (c.peekIs("(") && isBooleanGroup) {
        c.expect("("); val e = orExpr(); c.expect(")"); e
      } else Seq(parsePredicate(c))
    def andExpr(): Seq[CqlPredicate] = {
      var out = unit()
      while (c.accept("and")) out = out ++ unit()
      out
    }
    def orExpr(): Seq[CqlPredicate] = {
      var branches = Seq(andExpr())
      while (c.accept("or")) branches = branches :+ andExpr()
      if (branches.size == 1) branches.head else Seq(OrPredicate(branches))
    }
    orExpr()
  }

  private def parsePredicate(c: Cursor): CqlPredicate = {
    if (c.accept("(")) { // tuple restriction: (ck1, ck2) op (v1, v2)
      val cols = parseIdentList(c); c.expect(")")
      val op = c.next()
      if (op.equalsIgnoreCase("in")) {
        // `(ck1, ck2) IN ((1, 2), (3, 4))` — each element a full tuple;
        // `IN ()` is valid and matches nothing, like the single-column form
        c.expect("(")
        def tuple(): Any = {
          c.expect("(")
          var t = Seq(parseLiteral(c))
          while (c.accept(",")) t = t :+ parseLiteral(c)
          c.expect(")")
          t
        }
        var vals = Seq.empty[Any]
        if (!c.peekIs(")")) {
          vals = Seq(tuple())
          while (c.accept(",")) vals = vals :+ tuple()
        }
        c.expect(")")
        return TuplePredicate(cols, "in", vals)
      }
      c.expect("(")
      var vals = Seq(parseLiteral(c))
      while (c.accept(",")) vals = vals :+ parseLiteral(c)
      c.expect(")")
      return TuplePredicate(cols, op, vals)
    }
    val first = c.next()
    val isToken = first.equalsIgnoreCase("token") && c.peekIs("(")
    // `token(pk)` or the composite-key form `token(pk1, pk2, …)` — the
    // component list is carried comma-joined and split at validation, where
    // the upstream all-components-in-order rule is enforced
    val column = if (isToken) {
      c.expect("("); val xs = parseIdentList(c); c.expect(")"); xs.mkString(",")
    } else first
    if (!isToken && c.accept("[")) {
      // `m[k] = v` map-entry restriction (upstream ENTRIES-index query;
      // only equality is defined on entries
      // [U restrictions/SingleColumnRestriction]).
      val key = parseLiteral(c)
      c.expect("]")
      val op = c.next()
      if (op != "=") throw new CqlInvalidQueryException(
        s"Only EQ relations are supported on map entries (got $op)")
      return ColumnPredicate(column, "elem=", Seq(key, parseLiteral(c)))
    }
    if (c.accept("in")) {
      c.expect("(")
      // `pk IN ()` is VALID upstream (matches nothing) — empty marker list
      val vals =
        if (c.accept(")")) Seq.empty[Any]
        else {
          var vs = Seq(parseTerm(c))
          while (c.accept(",")) vs = vs :+ parseTerm(c)
          c.expect(")")
          vs
        }
      ColumnPredicate(column, "in", vals, isToken)
    } else if (c.accept("contains")) {
      if (c.accept("key")) ColumnPredicate(column, "contains key", Seq(parseLiteral(c)))
      else ColumnPredicate(column, "contains", Seq(parseLiteral(c)))
    } else if (c.accept("like")) {
      ColumnPredicate(column, "like", Seq(parseLiteral(c)))
    } else if (c.accept("is")) { // IS NOT NULL (MV definitions [U db/view/])
      c.expect("not"); c.expect("null")
      ColumnPredicate(column, "is not null", Nil)
    } else {
      val op = c.next() match {
        case o @ ("=" | "!=" | "<" | "<=" | ">" | ">=") => o
        case o => throw new CqlInvalidQueryException(s"unsupported operator $o")
      }
      // `token(col…) op token(v…)` — the rhs token() call computes the ring
      // token of literal key values (upstream TokenFct on constants [U])
      val v: Any =
        if (isToken && c.peekIs("token") && c.peekAt(1) == "(") {
          c.next(); c.expect("(")
          var vs = Seq(parseLiteral(c))
          while (c.accept(",")) vs = vs :+ parseLiteral(c)
          c.expect(")")
          CqlFnLit("token", CqlList(vs))
        } else parseTerm(c)
      ColumnPredicate(column, op, Seq(v), isToken)
    }
  }

  /** CQL duration → microseconds: `1d`, `12h`, `1h30m`, `90s`, … The
    * tokenizer splits `1h30m` into `1` + `h30m`; this re-joins and folds
    * the (quantity, unit) runs. Calendar-length units (y/mo) and
    * sub-microsecond ns are rejected — a floor bucket must have a fixed
    * width (upstream rejects months in floor for the same reason). */
  private val durationUnitMicros = Map(
    "w" -> 604800000000L, "d" -> 86400000000L, "h" -> 3600000000L,
    "m" -> 60000000L, "s" -> 1000000L, "ms" -> 1000L, "us" -> 1L)

  private def parseDurationMicros(c: Cursor): Long = {
    val n0 = c.next()
    if (!n0.nonEmpty || !n0.forall(_.isDigit))
      throw new CqlInvalidQueryException(s"invalid duration near $n0")
    val full = n0 + c.next()
    val re = "(\\d+)(mo|ms|us|ns|y|w|d|h|m|s)".r
    val parts = re.findAllMatchIn(full).toSeq
    if (parts.map(_.matched).mkString != full)
      throw new CqlInvalidQueryException(s"invalid duration $full")
    // exact arithmetic: a silent Long wrap would turn an absurd duration
    // into an arbitrary (possibly negative) bucket width and mis-bucket
    // every row instead of rejecting the query
    val total = try {
      parts.map { m =>
        val q = numeric(m.group(1).toLong, m.group(1))
        val unit = m.group(2)
        if (unit == "y" || unit == "mo")
          throw new CqlInvalidQueryException(
            s"floor does not support calendar-length durations ($unit)")
        if (unit == "ns")
          throw new CqlInvalidQueryException(
            "sub-microsecond floor durations are not supported")
        Math.multiplyExact(q, durationUnitMicros(unit))
      }.foldLeft(0L)(Math.addExact)
    } catch {
      case _: ArithmeticException =>
        throw new CqlInvalidQueryException(s"duration $full overflows")
    }
    if (total <= 0) throw new CqlInvalidQueryException(
      s"duration $full must be positive")
    total
  }

  /** Functions accepted in literal position (predicate bounds). */
  private val literalFns =
    Set("mintimeuuid", "maxtimeuuid", "totimestamp", "fromjson")

  /** LIMIT / PER PARTITION LIMIT operand: an int literal or a bind marker
    * (`?` / `:name` — upstream allows markers in limit position). */
  private def parseLimitValue(c: Cursor): Any =
    if (c.peekIs("?") || c.peekIs(":")) parseLiteral(c)
    else numeric(c.next().toInt, c.peek)

  /** Cassandra 4.0 operator expressions over literal TERMS — INSERT
    * values, UPDATE SET right-hand sides, WHERE comparison/IN values
    * (CASSANDRA-11935 [U cql3/functions/OperationFcts]): folded to a
    * constant at parse time with CQL numeric semantics — integral op
    * integral stays integral (`/` truncates toward zero, Java), any
    * double operand promotes the operation to IEEE double. Non-numeric
    * first operands pass through untouched (collections, strings, bind
    * markers keep their existing grammar, including `l = [v] + l`
    * prepend whose `+` follows a LIST literal). */
  private def foldTermArith(first: Any, c: Cursor): Any = {
    def isNum(v: Any) = v.isInstanceOf[Long] || v.isInstanceOf[Double]
    // numbers fold numerically; timestamp strings and durations fold via
    // the datetime arithmetic below (CASSANDRA-11936) — anything else
    // passes through so the surrounding grammars keep their meaning
    def isFoldable(v: Any) = isNum(v) ||
      v.isInstanceOf[String] || v.isInstanceOf[CqlDuration]
    if (!isFoldable(first) || !isArithOp(c.peek)) return first
    def primary(): Any =
      if (c.accept("(")) { val v = tail(primary(), 1); c.expect(")"); v }
      else parseLiteral(c) match {
        case n if isFoldable(n) => n
        case other => throw new CqlInvalidQueryException(
          s"operator expression expects a numeric, timestamp, or " +
            s"duration operand, got $other")
      }
    def binop(op: String, l: Any, r: Any): Any = (l, r) match {
      case (a: Long, b: Long) =>
        if ((op == "/" || op == "%") && b == 0L)
          throw new CqlInvalidQueryException("division by zero")
        op match {
          case "+" => a + b; case "-" => a - b; case "*" => a * b
          case "/" => a / b; case _ => a % b
        }
      // timestamp-literal ± duration → the shifted timestamp string
      // (CASSANDRA-11936 [U OperationFcts datetime ops]); `dur + ts` is
      // commutative for +, `ts - dur` only for −
      case (s: String, dur: CqlDuration) if op == "+" || op == "-" =>
        shiftTsLiteral(s, dur, op == "+")
      case (dur: CqlDuration, s: String) if op == "+" =>
        shiftTsLiteral(s, dur, add = true)
      case (a: CqlDuration, b: CqlDuration) if op == "+" || op == "-" =>
        val sign = if (op == "+") 1L else -1L
        try CqlDuration(
          Math.toIntExact(Math.addExact(a.months.toLong, sign * b.months)),
          Math.toIntExact(Math.addExact(a.days.toLong, sign * b.days)),
          Math.addExact(a.nanos, sign * b.nanos))
        catch { case _: ArithmeticException =>
          throw new CqlInvalidQueryException("duration overflow") }
      case _ if l.isInstanceOf[String] || r.isInstanceOf[String] ||
          l.isInstanceOf[CqlDuration] || r.isInstanceOf[CqlDuration] =>
        throw new CqlInvalidQueryException(
          s"the $op operator is not defined on these operand types")
      case _ =>
        def d(v: Any) = v match {
          case x: Long => x.toDouble; case x: Double => x
          case _ => throw new CqlInvalidQueryException(s"not numeric: $v")
        }
        val (a, b) = (d(l), d(r))
        op match {
          case "+" => a + b; case "-" => a - b; case "*" => a * b
          case "/" => a / b; case _ => a % b
        }
    }
    def tail(left0: Any, min: Int): Any = {
      var left = left0
      while (isArithOp(c.peek) && arithPrec(c.peek) >= min) {
        val op = c.next()
        left = binop(op, left, tail(primary(), arithPrec(op) + 1))
      }
      left
    }
    tail(first, 1)
  }

  /** A CQL timestamp literal ± a duration, folded at parse time: the
    * string parses as `yyyy-MM-dd[ HH:mm[:ss[.fff]]]` (space or `T`
    * separator, optional zone, UTC default — upstream
    * TimestampSerializer's accepted shapes), the duration applies in UTC
    * calendar arithmetic (months are calendar months, as upstream), and
    * the result renders back as an ISO instant every downstream consumer
    * (typedLit's cast, DESCRIBE echoes) already accepts. */
  private def shiftTsLiteral(s: String, dur: CqlDuration,
      add: Boolean): String = {
    import java.time._
    val norm = s.trim.replace(' ', 'T')
    val base: Instant =
      try {
        if (norm.endsWith("Z") || norm.matches(".*[+-]\\d{2}:?\\d{2}$"))
          OffsetDateTime.parse(
            // `+0000` (CQL) → `+00:00` (ISO) zone spelling
            norm.replaceAll("([+-]\\d{2})(\\d{2})$", "$1:$2")).toInstant
        else if (norm.contains("T"))
          LocalDateTime.parse(norm).toInstant(ZoneOffset.UTC)
        else LocalDate.parse(norm).atStartOfDay(ZoneOffset.UTC).toInstant
      } catch { case _: format.DateTimeParseException =>
        throw new CqlInvalidQueryException(
          s"cannot apply a duration to non-timestamp literal '$s'")
      }
    val sign = if (add) 1L else -1L
    base.atZone(ZoneOffset.UTC)
      .plusMonths(sign * dur.months)
      .plusDays(sign * dur.days)
      .plusNanos(sign * dur.nanos)
      .toInstant.toString // ISO instant, e.g. 2024-01-07T00:00:00Z
  }

  /** A literal term with operator folding — the general rhs shape. A
    * leading `(` can only open an arithmetic group in these positions
    * (tuple rhs forms are consumed by their own grammars earlier). */
  private def parseTerm(c: Cursor): Any =
    if (c.peek == "(") {
      c.next()
      val inner = parseTerm(c)
      c.expect(")")
      foldTermArith(inner, c)
    } else foldTermArith(parseLiteral(c), c)

  private def parseLiteral(c: Cursor): Any = {
    val t = c.next()
    if (t == "-") parseLiteral(c) match { // unary minus (own token, see tokenRe)
      case l: Long => -l
      case d: Double => -d
      case CqlDuration(m, d, n) => CqlDuration(-m, -d, -n)
      case other => throw new CqlInvalidQueryException(s"cannot negate $other")
    }
    else if (t == "?") CqlBindMarker // prepared-statement positional bind
    else if (t == ":") { // `:name` named bind marker (shares one variable
      // across repeated occurrences, upstream AbstractMarker [U])
      val n = c.next()
      if (!n.headOption.exists(ch => ch.isLetter || ch == '_'))
        throw new CqlInvalidQueryException(s"invalid bind name :$n")
      CqlNamedMarker(n.toLowerCase)
    }
    else if (literalFns(t.toLowerCase) && c.peekIs("(")) {
      c.expect("(")
      val arg = parseLiteral(c)
      c.expect(")")
      CqlFnLit(t.toLowerCase, arg)
    }
    else if (t.startsWith("'")) t.substring(1, t.length - 1).replace("''", "'")
    else if (t.length >= 2 && (t.startsWith("0x") || t.startsWith("0X"))) {
      // hex blob literal (upstream BytesType): decoded to bytes
      if (t.length % 2 != 0) throw new CqlInvalidQueryException(
        s"blob literal $t has an odd number of hex digits")
      t.drop(2).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
    else if (t.equalsIgnoreCase("true")) true
    else if (t.equalsIgnoreCase("false")) false
    else if (t.equalsIgnoreCase("null")) null
    else if (isDurationLiteral(t)) parseDuration(t) // ISO form, one token
    else if (t.contains('.') ||
        (t.nonEmpty && t.head.isDigit &&
          t.exists(ch => ch == 'e' || ch == 'E')))
      numeric(t.toDouble, t) // 1.5, 1.5e3, AND exponent-only 1e10 (Cql.g
      // FLOAT: INTEGER EXPONENT — previously failed to lex)
    else if (t.forall(_.isDigit) && !c.done &&
        isDurationLiteral(t + c.peek)) // `12h30m` lexes as "12"+"h30m"
      parseDuration(t + c.next())
    else numeric(t.toLong, t)
  }

  private def numeric[A](parse: => A, tok: String): A =
    try parse catch {
      case _: NumberFormatException =>
        throw new CqlInvalidQueryException(s"invalid numeric literal: $tok")
    }

  /** A possibly-negative integer literal (e.g. `USING TIMESTAMP -1`). */
  private def longLiteral(c: Cursor): Long = parseLiteral(c) match {
    case l: Long => l
    case other =>
      throw new CqlInvalidQueryException(s"expected an integer, got $other")
  }
}
