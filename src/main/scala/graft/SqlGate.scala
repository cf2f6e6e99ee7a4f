package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedFunction, UnresolvedHaving, UnresolvedInlineTable, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedTVFAliases, UnresolvedTableValuedFunction}
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical._

/** The SAFE analog of the reference's dynamic task submission
  * (`POST /submit` with Python source, master.py:41–74, exec()'d on every
  * worker — remote code execution by design, deliberately NOT
  * reproduced). Here a submitted task is ANSI SQL TEXT: Catalyst parses,
  * analyzes, and optimizes it against the registered tables, so a client
  * gets the reference's "ship me a query at runtime" capability with a
  * declarative, sandboxed surface instead of arbitrary code.
  *
  * "Sandboxed" is enforced, not assumed: the parsed plan is rejected if
  * it contains any statement beyond a pure query — `ADD JAR` /
  * `CREATE FUNCTION` (arbitrary bytecode), `INSERT OVERWRITE` (arbitrary
  * writes), `SET` (session mutation) and every other DDL/DML/command all
  * fail BEFORE execution (commands run eagerly in `spark.sql`, so the
  * check must precede it).
  *
  * Scale note: accepted queries inherit every engine property the
  * precompiled queries have — pushdown, pruning, AQE, codegen — because
  * this IS the same planner; there is no separate interpreted path.
  */
object SqlGate {

  /** All fixture tables under their reference names — the ONE list that
    * drives both [[tableNames]] and [[register]] (events gets the same
    * nanos→timestamp normalization the typed loaders apply, so SQL and
    * DataFrame callers see one schema). */
  private val tables: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "region" -> (Tables.region(_, _)),
    "nation" -> (Tables.nation(_, _)),
    "customer" -> (Tables.customer(_, _)),
    "supplier" -> (Tables.supplier(_, _)),
    "part" -> (Tables.part(_, _)),
    "orders" -> (Tables.orders(_, _)),
    "lineitem" -> (Tables.lineitem(_, _)),
    "events" -> (Tables.events(_, _)),
    "documents" -> (Tables.documents(_, _)),
    "embeddings" -> (Tables.embeddings(_, _)))

  val tableNames: Seq[String] = tables.map(_._1)

  /** Register every fixture table as a temp view for SQL access. */
  def register(spark: SparkSession, dir: String): Unit =
    tables.foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }

  /** Functions whose EXECUTION is arbitrary host code even inside a pure
    * SELECT: `reflect`/`java_method` (and the try_ variant) call any
    * static JVM method via CallMethodViaReflection. */
  private val deniedFunctions = Set("reflect", "java_method", "try_reflect")

  /** The ONLY logical plan node types a submitted query may contain — a
    * strict allow-list, checked against the exact parsed class. A
    * deny-list is the wrong shape for this gate: Spark's parser grows new
    * node types (and several "plain query" UnaryNodes execute host code —
    * `SELECT TRANSFORM ... USING '<shell cmd>'` parses to
    * [[ScriptTransformation]], `EXECUTE IMMEDIATE '<sql>'` to an
    * UnresolvedLeafNode that re-parses embedded text AFTER any check on
    * the outer plan), so anything unrecognized must fail closed.
    *
    * Everything here is pure relational algebra over already-allowed
    * relations: project/filter/agg/window/join/set-op/limit/sort, CTEs,
    * lateral + generate (explode), pivot/unpivot, sample, inline VALUES,
    * builtin table functions (range etc.), and hints. Commands, DDL/DML,
    * script transforms and nested-SQL nodes are all absent — rejected by
    * construction, including types added in future Spark versions. */
  private val allowedNodes: Set[Class[_]] = Set(
    classOf[Project], classOf[Filter], classOf[Aggregate], classOf[Sort],
    classOf[Join], classOf[LateralJoin], classOf[Generate],
    classOf[Union], classOf[Intersect], classOf[Except],
    classOf[Distinct], classOf[Deduplicate],
    classOf[GlobalLimit], classOf[LocalLimit], classOf[Offset], classOf[Tail],
    classOf[SubqueryAlias], classOf[UnresolvedSubqueryColumnAliases],
    classOf[UnresolvedWith], classOf[UnresolvedHaving],
    classOf[WithWindowDefinition], classOf[UnresolvedHint],
    classOf[Pivot], classOf[Unpivot], classOf[Sample],
    classOf[Repartition], classOf[RepartitionByExpression],
    classOf[OneRowRelation], classOf[UnresolvedRelation],
    // all-literal VALUES folds to LocalRelation at parse time; mixed ones
    // stay UnresolvedInlineTable — both are pure in-memory literal rows
    classOf[LocalRelation], classOf[UnresolvedInlineTable],
    classOf[UnresolvedTableValuedFunction], classOf[UnresolvedTVFAliases])

  /** Table-valued functions a submitted query may call BY NAME. The class
    * check above admits [[UnresolvedTableValuedFunction]] as a node type,
    * but the node is resolved to an arbitrary registered TVF by name
    * AFTER parsing — so the name needs its own allow-list, or a future
    * file-reading builtin TVF would slip through the class check. All of
    * these generate rows purely from their literal arguments. */
  private val allowedTvfs = Set(
    "range", "explode", "explode_outer", "posexplode", "posexplode_outer",
    "inline", "inline_outer", "stack")

  /** EVERY logical plan reachable from `root` — children, CTE bodies, and
    * plans nested inside subquery expressions. This is the one traversal
    * all three checks run over.
    *
    * `collect`/`collectWithSubqueries` are NOT enough: in Spark 4.x a
    * CTE's body lives in `UnresolvedWith.cteRelations`, which the node
    * exposes only through `innerChildren` (its `children` is just the
    * main query), and TreeNode traversal follows `children` only. A
    * `WITH t AS (<anything>) SELECT * FROM t` would otherwise hide
    * `<anything>` — script transforms, file-source relations, reflect()
    * — from every check while `spark.sql` still inlines and executes it.
    * So the worklist explicitly expands `children`, every `LogicalPlan`
    * in `innerChildren` (CTE bodies, nested arbitrarily), and every
    * `SubqueryExpression.plan` inside each node's expressions. */
  private def allPlans(root: LogicalPlan): Seq[LogicalPlan] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[LogicalPlan]
    def visit(p: LogicalPlan): Unit = {
      out += p
      p.children.foreach(visit)
      p.innerChildren.foreach {
        case lp: LogicalPlan => visit(lp)
        case _ => ()
      }
      p.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => visit(sq.plan)
        case _ => ()
      })
    }
    visit(root)
    out.toSeq
  }

  /** First relation reference that is neither a fixture table nor a CTE
    * visible at ITS OWN lexical scope. CTE visibility must be tracked
    * scope-by-scope, NOT collected globally: Catalyst resolves a
    * reference against only the WITH clauses enclosing it, so a
    * global name set would let `WITH q AS (WITH secrets AS (SELECT 1)
    * SELECT ...) SELECT * FROM secrets` whitelist the OUTER `secrets` —
    * which is out of the inner CTE's scope and would resolve against the
    * session catalog (a temp view or current-database table of that
    * name), laundering a non-fixture read through a nested CTE's name.
    * Each CTE body sees the names defined BEFORE it in its own WITH
    * clause plus everything from enclosing scopes — NOT its own name: in
    * non-recursive SQL `WITH t AS (SELECT * FROM t)` resolves the inner
    * `t` against the OUTER scope (i.e. the session catalog), so
    * admitting the self-name would launder a same-named temp view or
    * table through the CTE's own body (recursive self-reference is
    * therefore rejected — fail closed; the gate's query surface doesn't
    * include recursion). Subquery expressions see their enclosing node's
    * scope. */
  private def firstBadRelation(root: LogicalPlan,
                               fixtures: Set[String]): Option[String] = {
    def visit(p: LogicalPlan, visible: Set[String]): Option[String] = p match {
      case w: UnresolvedWith =>
        var vis = visible
        var err: Option[String] = None
        w.cteRelations.foreach { case (name, body, _) =>
          if (err.isEmpty) err = visit(body, vis)
          vis = vis + name.toLowerCase
        }
        err.orElse(visit(w.child, vis))
      case r: UnresolvedRelation =>
        if (r.multipartIdentifier.length == 1 &&
          (fixtures.contains(r.multipartIdentifier.head.toLowerCase) ||
            visible.contains(r.multipartIdentifier.head.toLowerCase))) None
        else Some(r.multipartIdentifier.mkString("."))
      case other =>
        var err: Option[String] = None
        other.children.foreach { c => if (err.isEmpty) err = visit(c, visible) }
        other.innerChildren.foreach {
          case lp: LogicalPlan if err.isEmpty => err = visit(lp, visible)
          case _ => ()
        }
        other.expressions.foreach(_.foreach {
          case sq: SubqueryExpression if err.isEmpty => err = visit(sq.plan, visible)
          case _ => ()
        })
        err
    }
    visit(root, Set.empty)
  }

  /** Submit a SQL task against the fixture tables; also registers the
    * graft extension functions so submitted text can use them.
    *
    * Four checks, all on the PARSED plan before anything executes, all
    * running over [[allPlans]] — which reaches subquery-expression plans
    * AND CTE bodies (innerChildren), both invisible to a plain `collect`:
    *  1. plan nodes: every node must be on [[allowedNodes]] — DDL/DML/
    *     commands, `SELECT TRANSFORM` script execution, `EXECUTE
    *     IMMEDIATE` nested SQL, and anything unrecognized fail closed;
    *  2. relations: a strict allow-list of the fixture tables plus CTEs
    *     the text itself defines — this closes the file-source escape,
    *     where `` SELECT * FROM text.`/any/host/path` `` parses to a
    *     plain UnresolvedRelation that `spark.sql.runSQLOnFiles` (on by
    *     default) would read straight off the host filesystem;
    *  3. table-valued functions: name must be on [[allowedTvfs]];
    *  4. expressions: the reflection functions above.
    *
    * @throws IllegalArgumentException for any rejected statement. */
  def submit(spark: SparkSession, dir: String, sql: String): DataFrame = {
    val parsed = spark.sessionState.sqlParser.parsePlan(sql)
    val plans = allPlans(parsed)
    val offender = plans.collectFirst {
      case p if !allowedNodes.contains(p.getClass) => p.nodeName
    }
    require(offender.isEmpty,
      s"SqlGate accepts queries only; rejected plan node: ${offender.getOrElse("")}")
    val badRel = firstBadRelation(parsed, tableNames.map(_.toLowerCase).toSet)
    require(badRel.isEmpty,
      s"SqlGate: relation is not a fixture table or in-scope CTE: ${badRel.getOrElse("")}")
    val badTvf = plans.collectFirst {
      case t: UnresolvedTableValuedFunction
          if t.name.length != 1 ||
            !allowedTvfs.contains(t.name.head.toLowerCase) =>
        t.name.mkString(".")
    }
    require(badTvf.isEmpty,
      s"SqlGate: table-valued function is not allow-listed: ${badTvf.getOrElse("")}")
    val badFn = plans.flatMap { p =>
      p.expressions.flatMap(_.collect {
        case f: UnresolvedFunction
            if deniedFunctions.contains(f.nameParts.last.toLowerCase) =>
          f.nameParts.mkString(".")
      })
    }.headOption
    require(badFn.isEmpty,
      s"SqlGate: denied function: ${badFn.getOrElse("")}")
    // registration is memoized so a service funneling many queries
    // through submit doesn't pay 10 parquet schema inferences + view
    // registrations per query. The memo key is the SESSION and the value
    // is the dir CURRENTLY registered in it — temp views are
    // session-global, so a (session, dir) pair-set would go stale the
    // moment a second dir overwrites the views: submit(s, A),
    // submit(s, B), submit(s, A) would find (s, A) memoized and silently
    // run against B's tables. Check-and-update runs under one lock so
    // two racing first registrations can't interleave register() calls
    // for different dirs. (If the caller drops the temp views manually,
    // use [[register]] directly.)
    registeredDir.synchronized {
      if (!registeredDir.get(spark).contains(dir)) {
        graft.functions.GraftFunctions.register(spark)
        register(spark, dir)
        registeredDir.put(spark, dir)
      }
    }
    spark.sql(sql)
  }

  /** session -> the dir whose tables its temp views currently hold —
    * weak keys so stopped sessions age out. All access synchronized on
    * the map itself (WeakHashMap is not thread-safe). */
  private val registeredDir =
    new scala.collection.mutable.WeakHashMap[SparkSession, String]
}
