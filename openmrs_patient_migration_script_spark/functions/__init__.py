from openmrs_patient_migration_script_spark.functions.ids import deterministic_uuid

__all__ = ["deterministic_uuid"]
