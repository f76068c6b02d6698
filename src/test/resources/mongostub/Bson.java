package org.bson.conversions;

/** Stub of the public driver marker interface (mongodb-driver-sync 4.x
 * API surface). Compiled at TEST RUNTIME into an isolated classloader by
 * MongoStubLoader — never on a build classpath — so MongoDriverSpec can
 * exercise graft.server.MongoDriverClient's reflection binding end-to-end
 * while the absent-driver failure mode stays testable in the same JVM.
 */
public interface Bson {}
