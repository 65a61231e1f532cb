from openmrs_patient_migration_script_spark.functions.ids import deterministic_uuid
from openmrs_patient_migration_script_spark.functions.numeric import dec_to_long

__all__ = ["deterministic_uuid", "dec_to_long"]
