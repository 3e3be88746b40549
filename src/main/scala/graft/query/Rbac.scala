package graft.query

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** Role-based access control over streams — the reference's RBAC model
  * (parseable `src/rbac/role.rs` privilege enum, `src/rbac/map.rs` user→role
  * maps, `user_auth_for_datasets` gate at `src/handlers/http/query.rs:176`)
  * reduced to its query/ingest essentials:
  *
  *   - `Admin` / `Editor`: every action on every stream;
  *   - `Writer(stream)`: ingest + query on that stream;
  *   - `Reader(stream)`: query only;
  *   - `Ingestor(stream)`: ingest only.
  *
  * Stream scope `None` = all streams (the reference's resource-wildcard
  * roles). Pure in-memory policy — persistence is the caller's concern, as
  * in the reference (roles live in metadata storage there).
  */
object Rbac {

  sealed trait Action
  case object QueryAction extends Action
  case object IngestAction extends Action

  sealed trait Privilege { def stream: Option[String] }
  final case class Admin() extends Privilege { val stream = None }
  final case class Editor() extends Privilege { val stream = None }
  final case class Writer(target: Option[String]) extends Privilege {
    def stream: Option[String] = target
  }
  final case class Reader(target: Option[String]) extends Privilege {
    def stream: Option[String] = target
  }
  final case class Ingestor(target: Option[String]) extends Privilege {
    def stream: Option[String] = target
  }

  private val grants = new ConcurrentHashMap[String, Seq[Privilege]]()

  def grant(user: String, privileges: Seq[Privilege]): Unit =
    grants.put(user, privileges)

  def revoke(user: String): Unit = { grants.remove(user); () }

  def allows(p: Privilege, action: Action, stream: String): Boolean = {
    val scopeOk = p.stream.forall(_ == stream)
    p match {
      case Admin() | Editor() => true
      case _: Writer          => scopeOk
      case _: Reader          => scopeOk && action == QueryAction
      case _: Ingestor        => scopeOk && action == IngestAction
    }
  }

  def authorized(user: String, action: Action, stream: String): Boolean =
    Option(grants.get(user)).exists(_.exists(allows(_, action, stream)))

  /** The reference's `user_auth_for_datasets`: every referenced stream must
    * be readable, else the whole query is rejected with the offending
    * stream named.
    */
  def authorizeQuery(user: String, streams: Seq[String]): Either[String, Unit] =
    streams.find(!authorized(user, QueryAction, _)) match {
      case Some(s) => Left(s"user '$user' lacks query access to stream '$s'")
      case None    => Right(())
    }

  def clear(): Unit = grants.clear()
}
