"""GraphQL skin over the engine (graphql/ module analog)."""
