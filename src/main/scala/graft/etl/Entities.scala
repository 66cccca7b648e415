package graft.etl

/** The four dimension entities and their landing→dim column mappings
  * (ETL.sql staging subqueries; see each spec's line cite).
  *
  * @param key            dimension natural key
  * @param attrs          (landing column → dim column) in dim order, key
  *                       first; these are the GROUP BY grain of the staging
  * @param scd2Dim        SCD2 history table name
  * @param scd1Dim        SCD1 table name
  * @param scd1Updatable  dim attrs the SCD1 UPDATE overwrites (and compares
  *                       for change). NOTE terminals: `terminal_type` is
  *                       grouped/inserted but never updated or compared
  *                       (ETL.sql:356-362) — a type-only change is silently
  *                       dropped. Replicated faithfully.
  * @param scd1Distinct   whether the SCD1 staging deduplicates — only
  *                       terminals has SELECT DISTINCT (ETL.sql:250); the
  *                       other stagings can emit duplicate rows per key
  *                       when a key has >1 grain combo in one batch, and
  *                       those duplicates reach the first INSERT. Quirk
  *                       preserved.
  */
final case class EntitySpec(
    name: String,
    key: String,
    attrs: Seq[(String, String)],
    scd2Dim: String,
    scd1Dim: String,
    scd1Updatable: Seq[String],
    scd1Distinct: Boolean)

object Entities {
  /** ETL.sql:11-29 (SCD2) / :243-272 (SCD1). */
  val terminals: EntitySpec = EntitySpec(
    name = "terminals",
    key = "terminal_id",
    attrs = Seq(
      "terminal" -> "terminal_id",
      "terminal_type" -> "terminal_type",
      "city" -> "terminal_city",
      "address" -> "terminal_address"),
    scd2Dim = "dim_terminals_hist",
    scd1Dim = "dim_terminals",
    scd1Updatable = Seq("terminal_city", "terminal_address"),
    scd1Distinct = true)

  /** ETL.sql:31-46 / :274-297. */
  val accounts: EntitySpec = EntitySpec(
    name = "accounts",
    key = "account_num",
    attrs = Seq(
      "account" -> "account_num",
      "account_valid_to" -> "valid_to",
      "client" -> "client"),
    scd2Dim = "dim_accounts_hist",
    scd1Dim = "dim_accounts",
    scd1Updatable = Seq("valid_to", "client"),
    scd1Distinct = false)

  /** ETL.sql:48-61 / :299-318. */
  val cards: EntitySpec = EntitySpec(
    name = "cards",
    key = "card_num",
    attrs = Seq(
      "card_num" -> "card_num",
      "account" -> "account_num"),
    scd2Dim = "dim_cards_hist",
    scd1Dim = "dim_cards",
    scd1Updatable = Seq("account_num"),
    scd1Distinct = false)

  /** ETL.sql:63-84 / :320-354. */
  val clients: EntitySpec = EntitySpec(
    name = "clients",
    key = "client_id",
    attrs = Seq(
      "client" -> "client_id",
      "last_name" -> "last_name",
      "first_name" -> "first_name",
      "patrinymic" -> "patrinymic",
      "date_of_birth" -> "date_of_birth",
      "passport" -> "passport_num",
      "passport_valid_to" -> "passport_valid_to",
      "phone" -> "phone"),
    scd2Dim = "dim_clients_hist",
    scd1Dim = "dim_clients",
    scd1Updatable = Seq("last_name", "first_name", "patrinymic",
      "date_of_birth", "passport_num", "passport_valid_to", "phone"),
    scd1Distinct = false)

  /** SCD2 apply order in the reference: terminals, (fact), accounts,
    * cards, clients (ETL.sql:86-235).
    */
  val all: Seq[EntitySpec] = Seq(terminals, accounts, cards, clients)
}
