from weaviate_spark.plans.spec import GetSpec, SortKey  # noqa: F401
from weaviate_spark.plans.compile import compile_get  # noqa: F401
from weaviate_spark.plans.parse import parse_query  # noqa: F401
from weaviate_spark.plans.graphql import parse_graphql  # noqa: F401
