package graft.pipeline

import java.time.{LocalDate, LocalDateTime, LocalTime}

/** A14 — the reference's schedule is a daily 06:00 cron
  * (`schedule_interval='0 6 * * *'`, reference
  * dags/copy_cloudsql_to_bigquery_v2.py:26). Scheduling lives OUTSIDE the
  * engine (cron / orchestrator); these helpers compute the run window so a
  * driver loop (or a `Trigger.AvailableNow` streaming job — the engine-
  * native variant, see [[graft.streaming.EventsStream]]) can align with
  * that contract.
  */
object Schedule {

  /** Next fire time of a daily HH:00 schedule strictly after `now`. */
  def nextDaily(hour: Int, now: LocalDateTime): LocalDateTime = {
    require(hour >= 0 && hour <= 23)
    val today = LocalDateTime.of(now.toLocalDate, LocalTime.of(hour, 0))
    if (today.isAfter(now)) today else today.plusDays(1)
  }

  /** The Airflow-style data-interval date for a run fired at `fireTime`:
    * the PREVIOUS day (a daily run processes yesterday's data — the
    * convention behind `{{ ds_nodash }}` staging keys).
    */
  def dataDateFor(fireTime: LocalDateTime): LocalDate =
    fireTime.toLocalDate.minusDays(1)
}
