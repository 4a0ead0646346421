package graft

import java.lang.reflect.{InvocationHandler, InvocationTargetException,
  Method, Proxy}
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo,
  SQLException}
import java.util.Properties
import java.util.logging.Logger

/** Dialect-shim JDBC driver (r13 verdict #5): `jdbc:fakepg:<path>`
  * delegates to embedded Derby at `<path>` but REWRITES every surfaced
  * SQLState to the code a DIFFERENT dialect reports for the same
  * condition — table-already-exists X0Y32 → Postgres 42P07, unique
  * violation 23505 → MySQL's class-form 23000, Derby's lock timeout
  * 40XL1 → the standard serialization failure 40001. No second
  * embedded engine resolves offline (zero egress; only Derby ships in
  * /opt/spark/jars), so this shim is the strongest runnable gate on
  * [[graft.sources.JdbcSink]]'s portability claims: a sink that keys
  * any decision on a Derby-specific SQLState (the r13 advice bug —
  * ensureTable matching X0Y32) fails against this driver exactly as it
  * would against real Postgres/MySQL. It does NOT emulate a second
  * dialect's DDL grammar or identifier folding — those claims stay
  * scoped to what the scaladoc says (standard `CREATE TABLE` /
  * `ALTER TABLE .. ADD COLUMN` / two-statement DML, all
  * dialect-shared).
  *
  * Implementation: every java.sql object reachable from the connection
  * is wrapped in a reflective proxy whose handler rewraps thrown
  * [[SQLException]]s with the translated state and wraps returned
  * java.sql values recursively.
  */
object FakePgDriver {
  val Prefix = "jdbc:fakepg:"

  private val states = Map(
    "X0Y32" -> "42P07", // table already exists: Derby → Postgres
    "23505" -> "23000", // unique violation: Derby/PG subclass → MySQL
    "40XL1" -> "40001") // Derby lock timeout → std serialization fail

  private def rewrap(e: SQLException): SQLException = {
    val st = Option(e.getSQLState).map(s => states.getOrElse(s, s)).orNull
    new SQLException(e.getMessage, st, e.getErrorCode, e)
  }

  private val wrappable: Seq[Class[_]] = Seq(
    classOf[Connection], classOf[java.sql.DatabaseMetaData],
    classOf[java.sql.CallableStatement], classOf[java.sql.PreparedStatement],
    classOf[java.sql.Statement], classOf[java.sql.ResultSet])

  private def maybeWrap(v: AnyRef): AnyRef = v match {
    case null => null
    case _ if Proxy.isProxyClass(v.getClass) => v
    case _ =>
      val ifaces = wrappable.filter(_.isInstance(v))
      if (ifaces.isEmpty) v
      else Proxy.newProxyInstance(getClass.getClassLoader,
        ifaces.toArray, new Handler(v))
  }

  private[graft] def wrapConnection(c: Connection): Connection =
    maybeWrap(c).asInstanceOf[Connection]

  private final class Handler(target: AnyRef) extends InvocationHandler {
    override def invoke(proxy: AnyRef, method: Method,
                        args: Array[AnyRef]): AnyRef = {
      val res =
        try {
          if (args == null) method.invoke(target)
          else method.invoke(target, args: _*)
        } catch {
          case e: InvocationTargetException => e.getCause match {
            case sq: SQLException => throw rewrap(sq)
            case other => throw other
          }
        }
      maybeWrap(res)
    }
  }

  // register exactly once, lazily on first ensureRegistered() call
  private lazy val registered: Unit =
    DriverManager.registerDriver(new FakePgDriver)

  def ensureRegistered(): Unit = registered
}

final class FakePgDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(FakePgDriver.Prefix)

  override def connect(url: String, info: Properties): Connection =
    if (!acceptsURL(url)) null
    else {
      val real = "jdbc:derby:" + url.stripPrefix(FakePgDriver.Prefix)
      val conn =
        try DriverManager.getConnection(real, info)
        catch { case e: SQLException => throw FakePgDriver.rewrap(e) }
      FakePgDriver.wrapConnection(conn)
    }

  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def getPropertyInfo(url: String,
                               info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = Logger.getLogger("fakepg")
}
