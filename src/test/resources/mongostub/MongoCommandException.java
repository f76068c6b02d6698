package com.mongodb;

/** Thrown by the stub server for refused commands (splitVector on an
 * unprivileged deployment) — the class-name the binding's
 * isCommandFailure walk matches.
 */
public class MongoCommandException extends MongoException {
    public MongoCommandException(String message) { super(message); }
}
