from neo_server_spark.functions.timefn import *  # noqa: F401,F403
from neo_server_spark.functions.strfn import *  # noqa: F401,F403
from neo_server_spark.functions.geofn import *  # noqa: F401,F403
