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
  private val roles = new ConcurrentHashMap[String, Seq[Privilege]]()
  private val userRoles = new ConcurrentHashMap[String, Seq[String]]()

  def grant(user: String, privileges: Seq[Privilege]): Unit =
    grants.put(user, privileges)

  def revoke(user: String): Unit = { grants.remove(user); () }

  // -------------------------------------------------- named roles (CRUD)
  // Reference role model (`src/handlers/http/role.rs`): a role is a named,
  // reusable privilege list; users are assigned role NAMES and resolve to
  // the union of their direct grants and their roles' privileges at check
  // time — editing a role re-scopes every holder immediately.

  def putRole(name: String, privileges: Seq[Privilege]): Unit =
    roles.put(name, privileges)

  def getRole(name: String): Option[Seq[Privilege]] = Option(roles.get(name))

  def listRoles(): Map[String, Seq[Privilege]] =
    roles.asScala.toMap

  /** Deleting a role in use is refused, as in the reference (`role.rs`
    * delete handler checks `users_for_roles`).
    */
  def deleteRole(name: String): Either[String, Unit] = {
    val holders = userRoles.asScala.collect {
      case (u, rs) if rs.contains(name) => u
    }
    if (holders.nonEmpty)
      Left(s"role '$name' is in use by: ${holders.toSeq.sorted.mkString(", ")}")
    else { roles.remove(name); Right(()) }
  }

  /** Assign role names to a user (replacing previous assignments).
    * Unknown role names are rejected.
    */
  def assignRoles(user: String, names: Seq[String]): Either[String, Unit] =
    names.find(!roles.containsKey(_)) match {
      case Some(missing) => Left(s"role '$missing' does not exist")
      case None          => userRoles.put(user, names); Right(())
    }

  def rolesOf(user: String): Seq[String] =
    Option(userRoles.get(user)).getOrElse(Seq.empty)

  def allows(p: Privilege, action: Action, stream: String): Boolean = {
    val scopeOk = p.stream.forall(_ == stream)
    p match {
      case Admin() | Editor() => true
      case _: Writer          => scopeOk
      case _: Reader          => scopeOk && action == QueryAction
      case _: Ingestor        => scopeOk && action == IngestAction
    }
  }

  /** Effective privileges: direct grants ∪ the user's roles' privileges. */
  def effectivePrivileges(user: String): Seq[Privilege] =
    Option(grants.get(user)).getOrElse(Seq.empty) ++
      rolesOf(user).flatMap(n => Option(roles.get(n)).getOrElse(Seq.empty))

  def authorized(user: String, action: Action, stream: String): Boolean =
    effectivePrivileges(user).exists(allows(_, action, stream))

  /** Role management is admin-only on the HTTP surface (reference role
    * handlers sit behind the admin permission).
    */
  def isAdmin(user: String): Boolean =
    effectivePrivileges(user).exists {
      case Admin() => true
      case _       => false
    }

  /** The reference's `user_auth_for_datasets`: every referenced stream must
    * be readable, else the whole query is rejected with the offending
    * stream named.
    */
  def authorizeQuery(user: String, streams: Seq[String]): Either[String, Unit] =
    streams.find(!authorized(user, QueryAction, _)) match {
      case Some(s) => Left(s"user '$user' lacks query access to stream '$s'")
      case None    => Right(())
    }

  def clear(): Unit = { grants.clear(); roles.clear(); userRoles.clear() }
}
