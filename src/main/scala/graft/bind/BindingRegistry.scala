package graft.bind

import graft.proto.PMessage

/** Message⇄table binding registry — the startup-time component that
  * decides which message type lands in which table, mirroring the
  * reference's registry semantics exactly
  * (message_binding_registry.go:14-70, applied from server.go:73-77):
  *
  *  - **explicit** bindings come from per-table config lists of
  *    message names (config.go:52): an unlisted message type is a hard
  *    error, as is any bind failure;
  *  - **autobind** walks every registered message; ones without a
  *    `bristle_table` option are skipped, the rest search the catalogs
  *    IN ORDER for their table — only "no such table" continues to the
  *    next catalog, any other bind failure propagates, and a message
  *    whose table exists nowhere is a hard error;
  *  - the registry is a name→binding map, so a later bind of the same
  *    message type overwrites an earlier one (the reference runs
  *    explicit then autobind into one map).
  *
  * Catalogs are ordered (cluster order in the reference's config);
  * messages are iterated in sorted-name order for determinism (the
  * reference iterates a Go map — per-message results are independent,
  * so order is unobservable there; here it is pinned).
  */
object BindingRegistry {

  /** One sink catalog (cluster analog): ordered name → table schema. */
  final case class Catalog(name: String, tables: Map[String, Seq[ChColumn]])

  /** Explicit per-table message lists: catalog → table → message names. */
  def bindExplicit(catalogs: Seq[Catalog],
      messages: Map[String, PMessage],
      tableMessages: Map[(String, String), Seq[String]],
      mode: SchemaBinder.UnsetMode = SchemaBinder.ZeroValues): Map[String, Binding] = {
    // a config entry naming a catalog/table that doesn't exist is a
    // hard error too — silently skipping it would leave its message
    // types unbound past startup, exactly what the fail-fast posture
    // exists to prevent
    tableMessages.keys.foreach { case (catName, tableName) =>
      val cat = catalogs.find(_.name == catName).getOrElse(
        throw BindError(s"explicit binding references unknown catalog '$catName'"))
      if (!cat.tables.contains(tableName))
        throw BindError(
          s"explicit binding references unknown table '$tableName' in catalog '$catName'")
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Binding]
    catalogs.foreach { cat =>
      cat.tables.toSeq.sortBy(_._1).foreach { case (tableName, cols) =>
        tableMessages.getOrElse((cat.name, tableName), Nil).foreach { msgName =>
          val msg = messages.getOrElse(msgName,
            throw BindError(s"message type '$msgName' is not registered"))
          out(msgName) = SchemaBinder.bind(msg, cols, mode)
        }
      }
    }
    out.toMap
  }

  /** Autobind by the `bristle_table` message option. */
  def autobind(catalogs: Seq[Catalog],
      messages: Map[String, PMessage],
      mode: SchemaBinder.UnsetMode = SchemaBinder.ZeroValues): Map[String, Binding] =
    messages.toSeq.sortBy(_._1).flatMap { case (name, msg) =>
      msg.bristleTable match {
        case None => None // no option → not auto-registered
        case Some(tableName) =>
          val hit = catalogs.iterator.flatMap(c => c.tables.get(tableName))
            .nextOption().getOrElse(throw BindError(
              s"failed to find table $tableName for message $name"))
          // table located: a bind failure here is a hard error, not a
          // fall-through to later catalogs (reference only retries on
          // ErrNoSuchTable)
          Some(name -> SchemaBinder.bind(msg, hit, mode))
      }
    }.toMap

  /** The server startup composition: explicit bindings first, then
    * autobind — same-name autobinds overwrite (map-write order in the
    * reference).
    */
  def bindAll(catalogs: Seq[Catalog],
      messages: Map[String, PMessage],
      tableMessages: Map[(String, String), Seq[String]] = Map.empty,
      mode: SchemaBinder.UnsetMode = SchemaBinder.ZeroValues): Map[String, Binding] =
    bindExplicit(catalogs, messages, tableMessages, mode) ++
      autobind(catalogs, messages, mode)
}
